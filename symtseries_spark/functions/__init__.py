"""Column-function surface: one import point for every reusable Column
expression / UDF factory the engine exposes (the Spark analogue of the
reference's 13-function Lua API, /root/reference/lua/lua_sax.c:387-409).
"""

from symtseries_spark.operators.index import fine_word_udf  # noqa: F401
from symtseries_spark.operators.symbolize import (  # noqa: F401
    mindist_pair_udf,
    mindist_udf,
    sax_word_udf,
)
from symtseries_spark.operators.text import (  # noqa: F401
    fingerprint,
    lang_id_udf,
    quality_score,
    subword_count,
    token_count,
)
from symtseries_spark.operators.dedup import (  # noqa: F401
    minhash_udf,
    simhash_udf,
)
from symtseries_spark.operators.similarity import (  # noqa: F401
    cosine_udf,
    srp_udf,
)
from symtseries_spark.operators.multimodal import sniff_mime  # noqa: F401

__all__ = [
    "sax_word_udf",
    "mindist_udf",
    "mindist_pair_udf",
    "fine_word_udf",
    "token_count",
    "subword_count",
    "quality_score",
    "lang_id_udf",
    "fingerprint",
    "minhash_udf",
    "simhash_udf",
    "cosine_udf",
    "srp_udf",
    "sniff_mime",
]
