"""Text-analysis functions for training-data pipelines.

All of these are pure Catalyst column expressions — they run JVM-side
inside whole-stage codegen, shuffle nothing, and push down with the
scan. No Python touches the data path, so they hold up unchanged on a
100 TB corpus. (The reference has no text analytics — these are the
pipeline ops a web-scale dedup corpus needs around the sketch core;
SURVEY.md §2.6 scope note.)

Every function is deliberately expressible in ANSI SQL (regexp counts,
md5, length arithmetic) so the driver's DuckDB oracle can replay it
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token regex: word pieces OR single non-space punctuation.
TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
WORD_RE = r"\S+"

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language identifier. Chosen to be discriminative and regex-safe.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "que"],
    "es": ["el", "los", "las", "que", "una", "por", "con", "para"],
    # ASCII-only on purpose: Java regex (?i) and RE2 (?i) disagree on
    # non-ASCII case folding, and the oracle must replay identically.
    "pl": ["nie", "jest", "czy", "na", "do", "jak", "ale", "tak"],
    # r5 widening (VERDICT r4 item 6). Profiles are collision-pruned:
    # a word frequent in language A must not sit in language B's
    # profile (e.g. "de"/"en" dropped from nl/pt — both are top-rank
    # French/Spanish words), otherwise A's texts bleed score into B.
    "it": ["che", "di", "il", "non", "per", "sono", "della", "anche"],
    "pt": ["em", "com", "uma", "dos", "das", "mais", "pelo", "sem"],
    "nl": ["het", "een", "van", "niet", "voor", "met", "zijn", "ook"],
    "sv": ["och", "att", "det", "som", "av", "inte", "har", "till"],
    "tr": ["bir", "ve", "bu", "ne", "ama", "gibi", "daha", "sonra"],
    "id": ["yang", "dan", "itu", "dengan", "untuk", "tidak", "ini", "dari"],
    "sw": ["na", "ya", "wa", "kwa", "katika", "za", "sana", "kwamba"],
}


def word_count(text: Column) -> Column:
    """Whitespace-delimited word count (0 for empty/NULL-safe callers)."""
    return F.size(F.regexp_extract_all(text, F.lit(WORD_RE), F.lit(0)))


def token_count(text: Column) -> Column:
    """BPE-ish token count: word pieces + individual punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))


def _stopword_hits(text: Column, words: list[str]) -> Column:
    """Occurrences of any profile word, word-bounded, case-insensitive."""
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.regexp_count(text, F.lit(pat))


def lang_scores(text: Column) -> Column:
    """Map lang → stopword-hit count per 100 words (the n-gram heuristic
    signal). Returned as a map column for inspection."""
    wc = F.greatest(word_count(text), F.lit(1))
    entries = []
    for lang, words in LANG_PROFILES.items():
        entries.append(F.lit(lang))
        entries.append(
            (_stopword_hits(text, words) * F.lit(100.0) / wc).cast("double")
        )
    return F.create_map(*entries)


def lang_id(text: Column, min_score: float = 1.0) -> Column:
    """Argmax language over stopword profiles; 'und' (undetermined) when
    no profile clears ``min_score`` hits per 100 words.

    Ties break by profile order (stable, documented): ``array_max`` over
    ``struct(score, -profile_index, lang)`` — the max score wins and on
    equal scores the EARLIEST profile (largest negated index) does,
    matching the oracle's running-strict-max CASE. Implementation note:
    the r1 chained-``when`` fold embedded the previous best expression
    twice per language — exponential expression-tree growth that hung
    Catalyst outright at 12 profiles; this form is linear."""
    wc = F.greatest(word_count(text), F.lit(1))
    entries = [
        F.struct(
            (_stopword_hits(text, words) * F.lit(100.0) / wc)
            .cast("double")
            .alias("s"),
            F.lit(-i).alias("ni"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, words) in enumerate(LANG_PROFILES.items())
    ]
    best = F.array_max(F.array(*entries))
    return F.when(
        best["s"] > F.lit(float(min_score)), best["lang"]
    ).otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """The standard quality-filter signals, each a Catalyst expression."""
    n_chars = F.length(text)
    wc = word_count(text)
    safe_wc = F.greatest(wc, F.lit(1)).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_words": wc,
        "mean_word_len": (
            F.length(F.regexp_replace(text, r"\s+", "")) / safe_wc
        ).cast("double"),
        "punct_ratio": (
            F.regexp_count(text, F.lit(r"[^\sA-Za-z0-9]")) / safe_chars
        ).cast("double"),
        "digit_ratio": (
            F.regexp_count(text, F.lit(r"[0-9]")) / safe_chars
        ).cast("double"),
        "stopword_ratio": (
            _stopword_hits(text, LANG_PROFILES["en"]) / safe_wc
        ).cast("double"),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score (Gopher/C4-style heuristics, each
    clause a penalty): long-enough, sane word length, not punctuation- or
    digit-heavy, carries some stopwords."""
    f = quality_features(text)
    checks = [
        (f["n_words"] >= 5).cast("double"),
        ((f["mean_word_len"] >= 2.0) & (f["mean_word_len"] <= 12.0)).cast("double"),
        (f["punct_ratio"] <= 0.3).cast("double"),
        (f["digit_ratio"] <= 0.3).cast("double"),
        (f["stopword_ratio"] > 0.0).cast("double"),
    ]
    total = checks[0]
    for c in checks[1:]:
        total = total + c
    return (total / F.lit(float(len(checks)))).cast("double")


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint of the *normalized* document:
    md5 of lowercased, whitespace-collapsed, trimmed text. Normalization
    makes near-identical boilerplate variants collide; md5 (not xxhash64)
    keeps the oracle replayable in any SQL engine."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


def is_valid_utf8(raw: Column) -> Column:
    """S2 UTF-8 validity gate on a BINARY column — the Catalyst analog
    of the reference's ``String::from_utf8`` match (reference
    src/bloom/process.rs:63-78). A binary→string cast keeps the raw
    bytes unvalidated; ``try_validate_utf8`` returns NULL exactly when
    they are not well-formed UTF-8. (Spark 4's ``decode`` is strict
    ANSI and THROWS on malformed input, so it cannot express a gate.)"""
    return F.try_validate_utf8(raw.cast("string")).isNotNull()


def extract_text(html: Column) -> Column:
    """Deterministic text extraction from an ``html:binary`` column —
    the north-star per-row invariant is that extraction is a PURE
    function of the payload (byte-identical text per url across runs
    and executors), so it is implemented entirely in Catalyst:

    1. UTF-8 validity gate (``is_valid_utf8``): invalid pages yield
       NULL (≙ the reference's pass-through domain, never deduped).
    2. drop <script>/<style> blocks, then strip all remaining tags.

    No whitespace collapsing: the extracted text preserves the
    document's own line structure (line-granularity dedup depends on
    it)."""
    decoded = F.try_validate_utf8(html.cast("string"))
    no_blocks = F.regexp_replace(
        decoded, r"(?is)<(script|style)\b[^>]*>.*?</\1>", ""
    )
    return F.regexp_replace(no_blocks, r"<[^>]*>", "")


# ------------------------------------------------------------- r3 additions

# PII patterns, deliberately ASCII-only and anchored on word boundaries so
# Java regex and RE2/DuckDB agree byte-for-byte (same constraint as
# LANG_PROFILES). These are the high-precision "scrub before training"
# classes; recall-maximizing PII detection needs NER, out of scope.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# international-ish phone: optional +CC, then 3 groups of digits with
# separators — at least 9 digits total keeps false positives (dates,
# version numbers) low
PHONE_RE = r"\+?[0-9]{1,3}[-. (]{1,2}[0-9]{3}[-. )]{1,2}[0-9]{3}[-. ]?[0-9]{2,4}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def redact_pii(
    text: Column,
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
    ip_token: str = "<IP>",
) -> Column:
    """Replace emails, phone numbers, and IPv4 literals with placeholder
    tokens — the standard pre-training scrub pass. Pure Catalyst
    (three regexp_replace, whole-stage codegen); order matters: emails
    first so their digit runs cannot be half-eaten by the phone rule."""
    out = F.regexp_replace(text, EMAIL_RE, email_token)
    out = F.regexp_replace(out, IPV4_RE, ip_token)
    return F.regexp_replace(out, PHONE_RE, phone_token)


def pii_counts(text: Column) -> Column:
    """Struct (emails, phones, ips) of per-document PII match counts —
    the audit/reporting side of :func:`redact_pii`."""
    return F.struct(
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("emails"),
        F.regexp_count(text, F.lit(PHONE_RE)).alias("phones"),
        F.regexp_count(text, F.lit(IPV4_RE)).alias("ips"),
    )


def normalize_url(url: Column) -> Column:
    """Canonical URL for URL-level dedup of a crawl: lowercase scheme +
    host, strip a leading ``www.``, drop the fragment and the query
    string (tracking params dominate), trim a trailing slash from the
    path. Deliberately regex-only (no parse_url) so the DuckDB oracle
    replays it byte-for-byte."""
    # split off fragment, then query
    base = F.regexp_replace(url, r"#.*$", "")
    base = F.regexp_replace(base, r"\?.*$", "")
    # lowercase ONLY the scheme://host prefix (paths are case-sensitive)
    lowered = F.concat(
        F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)),
        F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(.*)$", 1),
    )
    # a url without a scheme passes through the regexes as-is
    lowered = F.when(
        F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*://)", 1) == "", base
    ).otherwise(lowered)
    no_www = F.regexp_replace(lowered, r"^([a-z][a-z0-9+.-]*://)www\.", "$1")
    return F.regexp_replace(no_www, r"(.+?)/+$", "$1")


def line_repetition_ratio(text: Column) -> Column:
    """Fraction of a document's non-empty lines that are duplicates of
    an earlier line — the Gopher-style repetition signal (Rae et al.
    2021, "Scaling Language Models", §A1.1): boilerplate/spam pages
    repeat themselves. 0.0 for documents with ≤1 line; pure Catalyst
    (split + array ops, no shuffle, no Python)."""
    lines = F.filter(F.split(text, "\n"), lambda x: F.length(x) > 0)
    n = F.size(lines)
    distinct_n = F.size(F.array_distinct(lines))
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        (n - distinct_n).cast("double") / n.cast("double")
    )
