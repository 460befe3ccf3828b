r"""Text-analysis column functions (north-star extensions, SURVEY §7-E).

All JVM-side (`pyspark.sql.functions` only) so they stay inside
whole-stage codegen — no Python in the hot path.  Every function has a
deterministic DuckDB-SQL twin used by the oracle queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[^\w\s]"

# tiny per-language stopword anchors for the n-gram/lexicon heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
    "zh": ["的", "是", "了"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def ws_token_count(text: Column) -> Column:
    return F.size(F.split(text, r"\s+"))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PUNCT_PATTERN), F.lit(0)))


def lang_marker_pattern(lang: str) -> str:
    return r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"


def lang_score(text: Column, lang: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(lang_marker_pattern(lang)), F.lit(0)))


def lang_predict(text: Column) -> Column:
    """argmax over marker scores, first-wins tie order = LANG_ORDER."""
    scores = {lang: lang_score(text, lang) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    out = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        out = F.when(scores[lang] == best, lang).otherwise(out)
    return F.when(best == 0, "und").otherwise(out)


def sorted_token_fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted,
    lowercased token multiset (classic shingle-free near-dup key)."""
    return F.md5(F.array_join(F.array_sort(F.split(F.lower(text), " ")), " "))


def lang_predict_sql(expr: str) -> str:
    """DuckDB twin of :func:`lang_predict`."""
    score = {
        lang: f"len(regexp_extract_all({expr}, '{lang_marker_pattern(lang)}'))"
        for lang in LANG_ORDER
    }
    greatest = "greatest(" + ", ".join(score.values()) + ")"
    cases = " ".join(
        f"WHEN {score[lang]} = {greatest} THEN '{lang}'" for lang in LANG_ORDER[:-1]
    )
    return (
        f"CASE WHEN {greatest} = 0 THEN 'und' {cases} "
        f"ELSE '{LANG_ORDER[-1]}' END"
    )


def adjacent_bigrams(d):
    """(a, b) adjacent-token pairs from a frame with a ``text`` column —
    THE bigram definition shared by pagerank_word_graph and
    text_bigram_pmi (one copy of the tokenization means a change to,
    e.g., empty-token handling cannot desynchronize them)."""
    from pyspark.sql import functions as F

    toks = d.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    return (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i + 1).alias("a"),
                        F.element_at(F.col("t"), i + 2).alias("b"),
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .filter((F.col("a") != "") & (F.col("b") != ""))
    )


ADJ_BIGRAMS_SQL = """
    toks_adj AS (
      SELECT string_split(text, ' ') AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    adj AS (
      SELECT t[u.i+1] AS a, t[u.i+2] AS b
      FROM toks_adj, LATERAL (SELECT unnest(range(0, len(t) - 1)) AS i) u
      WHERE t[u.i+1] != '' AND t[u.i+2] != ''
    )
"""
