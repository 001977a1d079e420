"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, fingerprinting.

All pure generated-SQL column expressions (JVM-side in Spark) with DuckDB
twins — at 100 TB these run inside the scan stage with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import normalize_text_sql, tokens_sql

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "de", "y"),
    "it": ("il", "che", "di", "la", "per"),
}
_LANG_ORDER = tuple(STOPWORDS)  # deterministic tiebreak order


def _stop_hits(dialect: str, toks: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    if dialect == "spark":
        return f"size(filter({toks}, t -> array_contains(array({lst}), t)))"
    return f"len(list_filter({toks}, t -> list_contains([{lst}], t)))"


def token_count_sql(dialect: str, text: str) -> dict[str, str]:
    """Whitespace token count + regex (BPE-ish) token count."""
    toks = tokens_sql(dialect, text)
    if dialect == "spark":
        return {
            "ws_tokens": f"size({toks})",
            "bpe_tokens": f"size(regexp_extract_all({text}, '{_BPE_RE}', 0))",
        }
    return {
        "ws_tokens": f"len({toks})",
        "bpe_tokens": f"len(regexp_extract_all({text}, '{_BPE_RE}', 0))",
    }


def quality_sql(dialect: str, text: str) -> dict[str, str]:
    """Length / punctuation / stopword quality signals + composite score.

    Score = mean token length bounded + stopword ratio − punctuation ratio,
    rounded; a deterministic stand-in for the usual Gopher-style filters.
    """
    toks = tokens_sql(dialect, text)
    size_f = "size" if dialect == "spark" else "len"
    n_toks = f"{size_f}({toks})"
    g = ", 'g'" if dialect == "duckdb" else ""
    n_punct = f"length(regexp_replace({text}, '[a-zA-Z0-9 ]', ''{g}))"
    stop_hits = _stop_hits(dialect, toks, STOPWORDS["en"])
    return {
        "n_chars_calc": f"length({text})",
        "n_tokens": n_toks,
        "punct_ratio": f"ROUND(CAST({n_punct} AS DOUBLE) / length({text}), 6)",
        "stopword_ratio": f"ROUND(CAST({stop_hits} AS DOUBLE) / {n_toks}, 6)",
        "quality_score": (
            f"ROUND(least(CAST(length({text}) AS DOUBLE) / {n_toks}, 10.0) / 10.0"
            f" + CAST({stop_hits} AS DOUBLE) / {n_toks}"
            f" - CAST({n_punct} AS DOUBLE) / length({text}), 6)"
        ),
    }


def lang_id_sql(dialect: str, text: str) -> str:
    """Stopword-vote language ID with deterministic first-wins tiebreak."""
    toks = tokens_sql(dialect, text)
    scores = {lang: _stop_hits(dialect, toks, STOPWORDS[lang]) for lang in _LANG_ORDER}
    clauses = []
    for i, lang in enumerate(_LANG_ORDER):
        others = [scores[o] for o in _LANG_ORDER[i + 1 :]]
        cond = " AND ".join(f"{scores[lang]} >= {o}" for o in others) or "TRUE"
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


def fingerprint_sql(dialect: str, text: str) -> str:
    """Content fingerprint: md5 of the normalized text."""
    return f"md5({normalize_text_sql(dialect, text)})"


def positional_hashes_sql(dialect: str, text: str, k: int = 5) -> str:
    """Hash of every positional k-gram (NOT distinct — winnowing needs
    positions). The portable md5-based hash32 stands in for a Rabin rolling
    hash — incremental rolling is an evaluation trick SQL can't express,
    and winnowing's guarantees depend only on the positional hash values."""
    from .hashing import hash32_sql

    n_grams = f"greatest(length({text}) - {k - 1}, 1)"
    if dialect == "spark":
        return (
            f"transform(sequence(1, {n_grams}), "
            f"i -> {hash32_sql(f'substring({text}, i, {k})', dialect)})"
        )
    return (
        f"list_transform(generate_series(1, {n_grams}), "
        f"i -> {hash32_sql(f'substr({text}, i, {k})', dialect)})"
    )


def winnow_sql(dialect: str, hs: str, w: int = 4) -> str:
    """Winnowing (the MOSS scheme) over a PRE-COMPUTED positional-hash array
    column: keep the minimum of each w-wide window, distinct. Two-stage on
    purpose — inlining the hash array here would re-hash every k-gram once
    per window (O(n·w) hashing instead of O(n)). Selected fingerprints are
    guaranteed to overlap for any shared substring of length ≥ w+k−1."""
    if dialect == "spark":
        return (
            f"array_distinct(transform(sequence(1, greatest(size({hs}) - {w - 1}, 1)), "
            f"j -> array_min(slice({hs}, j, {w}))))"
        )
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({hs}) - {w - 1}, 1)), "
        f"j -> list_min(list_slice({hs}, j, j + {w - 1}))))"
    )


# -- Spark DataFrame wrappers ----------------------------------------------


def with_token_counts(docs: DataFrame) -> DataFrame:
    exprs = token_count_sql("spark", "text")
    return docs.select(
        "doc_id", *[F.expr(e).cast("int").alias(k) for k, e in exprs.items()]
    )


def with_quality(docs: DataFrame) -> DataFrame:
    exprs = quality_sql("spark", "text")
    casts = {"n_chars_calc": "int", "n_tokens": "int"}
    return docs.select(
        "doc_id",
        *[F.expr(e).cast(casts.get(k, "double")).alias(k) for k, e in exprs.items()],
    )


def with_lang_id(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "lang", F.expr(lang_id_sql("spark", "text")).alias("lang_pred")
    )


def with_fingerprint(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.expr(fingerprint_sql("spark", "text")).alias("fingerprint"))


# -- PII scrubbing ----------------------------------------------------------

# Conservative patterns: emails, international-ish phone numbers, and IPv4
# addresses — the redaction set every public-corpus pipeline starts from.
# Deliberately BACKSLASH-FREE: Spark SQL string literals eat backslash
# escapes ('\b' → backspace) while DuckDB's don't, so any pattern with a
# backslash silently diverges between the engines. Literal dots are [.],
# hyphens sit first/last in character classes, word boundaries are dropped.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"),
    ("phone", "[+][0-9][-0-9() ]{6,}[0-9]"),
    ("ipv4", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"),
)


def pii_scrub_sql(dialect: str, text: str) -> dict[str, str]:
    """Redacted text + per-category match counts as column expressions.

    Counts are computed on the ORIGINAL text; the scrub chain composes in a
    fixed order (email → phone → ipv4), each stage over the previous one's
    output — deterministic and identical in both engines."""
    g = ", 'g'" if dialect == "duckdb" else ""
    count_f = "len" if dialect == "duckdb" else "size"
    # Spark's regexp_extract_all defaults to group 1; these patterns have no
    # groups, so group 0 must be explicit. DuckDB returns full matches.
    idx = "" if dialect == "duckdb" else ", 0"
    out: dict[str, str] = {}
    scrubbed = text
    for name, pat in PII_PATTERNS:
        out[f"n_{name}"] = f"{count_f}(regexp_extract_all({text}, '{pat}'{idx}))"
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '<{name.upper()}>'{g})"
    out["scrubbed"] = scrubbed
    return out


def with_pii_scrub(docs: DataFrame) -> DataFrame:
    exprs = pii_scrub_sql("spark", "text")
    casts = {"n_email": "int", "n_phone": "int", "n_ipv4": "int"}
    return docs.select(
        "doc_id",
        *[F.expr(e).cast(casts.get(k, "string")).alias(k) for k, e in exprs.items()],
    )


# -- repetition detection (Gopher-style) ------------------------------------


def repetition_sql(dialect: str, text: str, n: int = 3) -> dict[str, str]:
    """Duplicate n-gram fraction: 1 − distinct(n-grams)/total(n-grams), the
    Gopher repetition filter's core signal (high value ⇒ boilerplate /
    looping text). Token n-grams are built positionally from the whitespace
    token array — one tokenize pass, no re-scan per n."""
    toks = tokens_sql(dialect, text)
    if dialect == "spark":
        grams = (
            f"transform(sequence(1, greatest(size({toks}) - {n - 1}, 1)), "
            f"i -> concat_ws(' ', slice({toks}, i, {n})))"
        )
        return {
            "n_grams": f"size({grams})",
            "dup_ngram_frac": (
                f"ROUND(1.0 - CAST(size(array_distinct({grams})) AS DOUBLE)"
                f" / size({grams}), 6)"
            ),
        }
    grams = (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )
    return {
        "n_grams": f"len({grams})",
        "dup_ngram_frac": (
            f"ROUND(1.0 - CAST(len(list_distinct({grams})) AS DOUBLE) / len({grams}), 6)"
        ),
    }


def with_repetition(docs: DataFrame) -> DataFrame:
    exprs = repetition_sql("spark", "text")
    casts = {"n_grams": "int"}
    return docs.select(
        "doc_id",
        *[F.expr(e).cast(casts.get(k, "double")).alias(k) for k, e in exprs.items()],
    )
