"""Deterministic synthetic Common-Crawl-style table generator.

Schema per BASELINE.json input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string).

Design goals (FIXTURES.md §1):
  * zipf-skewed hosts with one hot host holding ~30% of rows (salting tests),
  * revisit pattern per url over a ≥3-day span (1m/1h/1d tiers non-trivial),
  * deliberate whole-bucket gaps (gap-fill / '#' frames),
  * ``text`` a pure function of (url, warc_ts) so byte-identity is checkable,
  * everything a *pure column expression* over ``spark.range`` — generation
    itself is distributed, deterministic, and seedless (hash arithmetic, no
    RNG state), so the same (n_urls, revisits) args give identical bytes at
    any parallelism. That property is what makes the local[8]-vs-local[32]
    scaling benchmark an apples-to-apples comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"
N_HOSTS = 50
LANGS = ["en", "de", "ru", "es", "fr"]


def gen_crawl(
    spark: SparkSession,
    n_urls: int = 500,
    revisits: int = 240,
    revisit_minutes: int = 1,
    gap_mod: int = 7,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the crawl_pages table: n_urls × revisits rows minus gaps.

    Row id → (url_idx = id % n_urls, visit = id / n_urls). Visits are
    ``revisit_minutes`` apart starting at BASE_TS, so with the defaults each
    url has a 4-hour dense 1-minute series; scale ``revisits`` up for
    multi-day spans. Rows where hash(url_idx, visit) % gap_mod == 0 are
    dropped → deterministic whole-bucket gaps.
    """
    total = n_urls * revisits
    df = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)
    url_idx = (F.col("id") % n_urls).alias("url_idx")
    visit = (F.col("id") / n_urls).cast("long").alias("visit")
    df = df.select(url_idx, visit)

    # zipf-ish hosts: ~30% of urls on host 0 (the hot host), rest spread via
    # a multiplicative hash. host is a function of url_idx only.
    h = F.pmod(F.col("url_idx") * F.lit(2654435761), F.lit(1_000_003))
    host_id = F.when(F.col("url_idx") % 10 < 3, F.lit(0)).otherwise(
        F.pmod(h, F.lit(N_HOSTS - 1)) + 1
    )
    df = df.withColumn("host_id", host_id.cast("int"))
    df = df.withColumn(
        "url",
        F.concat(
            F.lit("https://host"),
            F.col("host_id").cast("string"),
            F.lit(".example.com/p"),
            F.col("url_idx").cast("string"),
        ),
    )
    df = df.withColumn(
        "warc_ts",
        F.to_timestamp(F.lit(BASE_TS))
        + F.make_interval(mins=(F.col("visit") * revisit_minutes).cast("int")),
    )
    # deterministic gaps: whole missing (url, visit) buckets
    gap_h = F.pmod(F.col("url_idx") * 31 + F.col("visit") * 17, F.lit(gap_mod))
    df = df.filter(gap_h != 0)
    # url-level skew: ~1/17 of urls are "hot" (keep every visit); the rest
    # keep 1 visit in 5 → hot urls carry ~5× the rows (aggregation-skew tests)
    hot_url = F.col("url_idx") % 17 == 0
    df = df.filter(hot_url | (F.col("visit") % 5 == 0))

    # text length signal: per-url base length + a periodic "shape" over
    # visits (so per-url text-length series have structure worth symbolizing)
    base_len = F.pmod(F.col("url_idx") * 131, F.lit(100)) + 50
    wave = (
        F.sin(F.col("visit") * (F.lit(6.283185307179586) / 60.0)
              + F.col("url_idx") % 7)
        * 40.0
    ).cast("int")
    spike = F.when(F.pmod(F.col("visit"), F.lit(97)) == 0, F.lit(300)).otherwise(0)
    text_len = (base_len + wave + spike).cast("int")
    df = df.withColumn(
        "text",
        F.concat(
            F.col("url"),
            F.lit("|"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit("|"),
            F.repeat(F.lit("x"), text_len),
        ),
    )
    df = df.withColumn(
        "html",
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"),
                          F.lit("</body></html>")), "UTF-8"),
    )
    df = df.withColumn(
        "lang",
        F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                     (F.col("host_id") % len(LANGS) + 1).cast("int")),
    )
    return df.select("url", "warc_ts", "html", "text", "lang")


def write_crawl(spark: SparkSession, path: str, **kw) -> str:
    gen_crawl(spark, **kw).write.mode("overwrite").parquet(path)
    return path
