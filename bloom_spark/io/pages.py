"""Deterministic Common-Crawl-style pages table (FIXTURES.md §1).

Shape fixed by BASELINE.json:input_hint:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Everything is a pure Catalyst expression of the row id (seeded by
xxhash64) — zero Python in the generator, so it synthesizes at any scale
with full parallelism and is bit-reproducible (the per-url byte-identical
extraction invariant holds trivially: ``text`` is a pure function of
``url``'s id).

Skew: hosts are polynomially skewed (u³ over ~1000 hosts) so a few hosts
dominate — exercises salted repartitioning. Duplication: ~30% of pages
reuse the text of a deterministic earlier page id; popular lines recur
across pages via a finite phrase pool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOSTS = 1000
PHRASE_POOL = 5000
DUP_FRACTION = 0.3
INVALID_UTF8_FRACTION = 0.005

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _u01(col, salt: int):
    """Deterministic uniform [0,1) from a column + salt, JVM-side."""
    return (
        F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1 << 30)).cast("double")
        / float(1 << 30)
    )


def _text_expr(eff_id):
    """1..20 newline-joined phrases drawn from a finite pool — a pure
    function of ``eff_id``."""
    n_lines = (F.pmod(F.xxhash64(eff_id, F.lit(11)), F.lit(20)) + 1).cast("int")
    line = lambda j: F.concat(  # noqa: E731
        F.lit("phrase "),
        F.pmod(F.xxhash64(eff_id, j.cast("long"), F.lit(13)), F.lit(PHRASE_POOL)),
        F.lit(" of page "),
        F.pmod(F.xxhash64(eff_id, F.lit(17)), F.lit(997)),
    )
    return F.array_join(
        F.transform(F.sequence(F.lit(1), n_lines), line), "\n"
    )


def synthesize_pages(
    spark: SparkSession, n_rows: int, num_partitions: int | None = None
) -> DataFrame:
    """Build the pages DataFrame; fully declarative, seed-deterministic."""
    df = spark.range(0, n_rows, numPartitions=num_partitions)
    i = F.col("id")

    host_u = _u01(i, 1)
    host_id = F.floor(host_u * host_u * host_u * N_HOSTS).cast("long")
    url = F.concat(F.lit("https://host-"), host_id, F.lit(".example.com/p/"), i)

    is_dup = _u01(i, 2) < DUP_FRACTION
    # dup pages reuse the text of a deterministic "original" id drawn from
    # the non-dup id space (re-map until the donor is itself non-dup is
    # unnecessary: text is a pure function of eff_id either way).
    donor = F.pmod(F.xxhash64(i, F.lit(3)), F.greatest(i, F.lit(1)))
    eff_id = F.when(is_dup, donor).otherwise(i)
    text = _text_expr(eff_id)

    is_invalid = _u01(i, 4) < INVALID_UTF8_FRACTION
    html_valid = F.concat(
        F.encode(F.lit("<html><body>"), "utf-8"),
        F.encode(text, "utf-8"),
        F.encode(F.lit("</body></html>"), "utf-8"),
    )
    # invalid pages get raw 0xFF 0xFE spliced in (reference S2 passthrough
    # semantics exercise, process.rs:63-78) and a NULL text (extraction
    # "fails" deterministically).
    html = F.when(
        is_invalid, F.concat(F.encode(F.lit("<html>"), "utf-8"), F.unhex(F.lit("FFFE")))
    ).otherwise(html_valid)
    text_out = F.when(is_invalid, F.lit(None).cast("string")).otherwise(text)

    langs = F.array(*[F.lit(x) for x in ["en", "en", "en", "en", "de", "fr", "es", "pl", "zh"]])
    lang = F.element_at(langs, (F.pmod(F.xxhash64(i, F.lit(5)), F.lit(9)) + 1).cast("int"))

    warc_ts = F.timestamp_seconds(F.lit(1735689600) + i * 37)  # 2025-01-01 UTC

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text_out.alias("text"),
        lang.alias("lang"),
        i.alias("page_id"),  # synthesis convenience; drop for strict shape
    )
