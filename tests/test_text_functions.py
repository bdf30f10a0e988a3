"""Text-analysis Catalyst functions (functions/text.py)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from bloom_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_features,
    quality_score,
    token_count,
    word_count,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def sample(spark):
    rows = [
        (1, "The cat sat on the mat, and it is happy."),
        (2, "Der Hund ist nicht in der Küche und das ist gut."),
        (3, "le chat est sur la table et les livres sont là"),
        (4, "zzz qqq xxx"),
        (5, "a b"),
        (6, "1234 5678 9012 3456 7890 1111"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def test_word_and_token_count(spark, sample):
    got = {
        r["id"]: (r["wc"], r["tc"])
        for r in sample.select(
            "id",
            word_count(F.col("text")).alias("wc"),
            token_count(F.col("text")).alias("tc"),
        ).collect()
    }
    assert got[5] == (2, 2)
    # "The cat sat on the mat, and it is happy." → 10 words; tokens add , .
    assert got[1] == (10, 12)


def test_lang_id(spark, sample):
    got = {r["id"]: r["lang"] for r in sample.select(
        "id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_lang_id_wide_profiles(spark):
    """r5: 12-language profiles over a mixed-language fixture — each
    snippet written in its language's everyday register; an ambiguous
    text and digit soup fall to 'und'."""
    fixtures = [
        ("en", "the cat and the dog ran to the house in the rain"),
        ("de", "der Hund und die Katze sind nicht in das Haus zu gehen"),
        ("fr", "le chat et la souris sont dans les champs est une que"),
        ("es", "el perro y los gatos que corren por el parque con una para"),
        ("pl", "nie wiem czy to jest tak jak mowisz ale na pewno do domu"),
        ("it", "che cosa sono queste cose di cui non si parla anche per il caso"),
        ("pt", "em casa com uma das pessoas mais felizes dos tempos sem pelo"),
        ("nl", "het is een mooie dag van niet te veel werk met ook zijn voor"),
        ("sv", "det var en dag som inte har varit till och att se av allt"),
        ("tr", "bu ve bir ne kadar ama gibi daha sonra geldi"),
        ("id", "yang ini dan itu dengan untuk tidak ada dari sana"),
        ("sw", "watu wa hapa na ya kwamba katika nchi za sana kwa sababu"),
        ("und", "xqzt vlmp wrtk 12345 67890"),
    ]
    df = spark.createDataFrame(fixtures, "want string, text string")
    rows = df.select("want", lang_id(F.col("text")).alias("got")).collect()
    wrong = [(r["want"], r["got"]) for r in rows if r["want"] != r["got"]]
    assert not wrong, f"misidentified: {wrong}"


def test_quality_score_ordering(spark, sample):
    got = {r["id"]: r["q"] for r in sample.select(
        "id", quality_score(F.col("text")).alias("q")).collect()}
    # real English sentence beats digit soup and 2-word fragment
    assert got[1] > got[6]
    assert got[1] > got[5]
    assert 0.0 <= min(got.values()) and max(got.values()) <= 1.0


def test_quality_features_values(spark):
    df = spark.createDataFrame([(1, "ab cd!")], "id int, text string")
    f = quality_features(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in f.items()]).collect()[0]
    assert row["n_chars"] == 6
    assert row["n_words"] == 2
    assert row["punct_ratio"] == pytest.approx(1 / 6)
    assert row["mean_word_len"] == pytest.approx(5 / 2)  # "ab"+"cd!" = 5 chars


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD  "),
         (4, "different")],
        "id int, text string",
    )
    fps = [r["fp"] for r in df.select(doc_fingerprint(F.col("text")).alias("fp"))
           .collect()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]


def test_fingerprint_matches_duckdb(spark):
    """The oracle contract: identical md5-of-normalized in any engine."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    mine = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", doc_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    oracle = dict(
        duckdb.sql(
            f"""SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                FROM '{SF}/documents.parquet' LIMIT 50"""
        ).fetchall()
    )
    for k, v in mine.items():
        assert oracle[k] == v


class TestExtraction:
    def test_extract_text_byte_identical_invariant(self, spark):
        """North-star invariant: extraction is a pure function of the
        payload — on the synthetic pages table it must reproduce the
        generator's text column byte-for-byte, and NULL exactly on the
        invalid-UTF-8 pages."""
        import pyspark.sql.functions as F

        from bloom_spark.functions.text import extract_text
        from bloom_spark.io.pages import synthesize_pages

        pages = synthesize_pages(spark, 20_000, num_partitions=8)
        ext = pages.withColumn("etext", extract_text(F.col("html")))
        mismatches = ext.where(
            (F.col("etext").isNull() != F.col("text").isNull())
            | (F.col("etext") != F.col("text"))
        ).count()
        assert mismatches == 0
        assert ext.where("etext IS NULL").count() > 0  # invalid rows exist

    def test_extract_strips_scripts_and_tags(self, spark):
        import pyspark.sql.functions as F

        from bloom_spark.functions.text import extract_text

        df = spark.createDataFrame(
            [(bytearray(b"<html><script>var x=1;</script><b>Hello</b>\nworld</html>"),)],
            "html binary",
        )
        got = df.select(extract_text(F.col("html")).alias("t")).first()["t"]
        assert got == "Hello\nworld"

    def test_invalid_utf8_yields_null(self, spark):
        import pyspark.sql.functions as F

        from bloom_spark.functions.text import extract_text, is_valid_utf8

        df = spark.createDataFrame(
            [(bytearray(b"<p>ok</p>"),), (bytearray(b"<p>\xff\xfe</p>"),)],
            "html binary",
        )
        out = df.select(
            extract_text(F.col("html")).alias("t"),
            is_valid_utf8(F.col("html")).alias("v"),
        ).collect()
        assert out[0]["t"] == "ok" and out[0]["v"]
        assert out[1]["t"] is None and not out[1]["v"]


class TestR3TextOps:
    def test_redact_pii_and_counts(self, spark):
        from bloom_spark.functions.text import pii_counts, redact_pii

        df = spark.createDataFrame(
            [(1, "mail a.b+c@test.org or call +44 (201) 123-4567, "
                 "server 10.0.0.1 done")],
            "id int, t string",
        )
        row = df.select(
            redact_pii(F.col("t")).alias("r"), pii_counts(F.col("t")).alias("c")
        ).collect()[0]
        assert "<EMAIL>" in row["r"] and "<PHONE>" in row["r"] and "<IP>" in row["r"]
        assert "test.org" not in row["r"] and "10.0.0.1" not in row["r"]
        assert (row["c"]["emails"], row["c"]["phones"], row["c"]["ips"]) == (1, 1, 1)
        # email digits are not half-eaten by the phone rule
        clean = df.select(redact_pii(F.lit("x123456789@y.com")).alias("r")).collect()
        assert clean[0]["r"] == "<EMAIL>"

    def test_normalize_url(self, spark):
        from bloom_spark.functions.text import normalize_url

        cases = {
            "https://WWW.Example.COM/Path/A?q=1#f": "https://example.com/Path/A",
            "HTTP://Example.com/a/": "http://example.com/a",
            "https://example.com/a//": "https://example.com/a",
            "example.com/NoScheme/": "example.com/NoScheme",
            "https://www.example.com": "https://example.com",
        }
        df = spark.createDataFrame([(u,) for u in cases], "url string")
        got = {
            r["url"]: r["n"]
            for r in df.select(
                "url", normalize_url(F.col("url")).alias("n")
            ).collect()
        }
        for raw, want in cases.items():
            assert got[raw] == want, (raw, got[raw], want)

    def test_line_repetition_ratio(self, spark):
        from bloom_spark.functions.text import line_repetition_ratio

        df = spark.createDataFrame(
            [(1, "a\nb\nc"), (2, "a\na\na\na"), (3, "a\n\na"), (4, "solo"), (5, "")],
            "id int, t string",
        )
        got = {
            r["id"]: r["r"]
            for r in df.select(
                "id", line_repetition_ratio(F.col("t")).alias("r")
            ).collect()
        }
        assert got[1] == 0.0
        assert got[2] == 0.75          # 4 lines, 1 distinct
        assert got[3] == 0.5           # empty line dropped: a,a
        assert got[4] == 0.0 and got[5] == 0.0
