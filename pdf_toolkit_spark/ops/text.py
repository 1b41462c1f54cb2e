"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure built-in-function queries (JVM-side, whole-stage codegen; zero
Python). Each has an exact DuckDB oracle. At 100 TB these are
embarrassingly parallel scans: no shuffle except the final aggregate in
``lang_id_distribution``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import SQL_NORM, norm_text, table

# Language marker words: occurrences counted on the normalized text
# with space padding so word boundaries are honest.
_LANG_MARKERS = {"en": "the", "es": "la", "de": "der", "fr": "le"}


def _occurrences(col, word: str):
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    norm = norm_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.when(norm == "", 0).otherwise(F.size(F.split(norm, " "))).alias("n_tokens"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword heuristics -> one quality scalar
    (rounded for cross-engine float stability)."""

    docs = table(spark, sf_dir, "documents")
    norm = norm_text(F.col("text"))
    n_tokens = F.when(norm == "", 0).otherwise(F.size(F.split(norm, " ")))
    n_chars = F.length(F.col("text"))
    alpha = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    stop = _occurrences(norm, "the") + _occurrences(norm, "of") + _occurrences(norm, "and")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * (alpha / F.greatest(n_chars, F.lit(1))),
            6,
        ).alias("quality"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language guess; deterministic argmax with fixed
    precedence en > es > de > fr (ties resolve to the earlier)."""

    docs = table(spark, sf_dir, "documents")
    norm = norm_text(F.col("text"))
    c = {k: _occurrences(norm, w) for k, w in _LANG_MARKERS.items()}
    best = F.greatest(*c.values())
    pred = (
        F.when(best == 0, "und")
        .when(c["en"] == best, "en")
        .when(c["es"] == best, "es")
        .when(c["de"] == best, "de")
        .otherwise("fr")
    )
    return docs.select(
        "doc_id", c["en"].alias("c_en"), c["es"].alias("c_es"),
        c["de"].alias("c_de"), c["fr"].alias("c_fr"), pred.alias("lang_pred"),
    )


def lang_id_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(spark, sf_dir).groupBy("lang_pred").agg(F.count("*").alias("n_docs"))


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document fingerprint: md5 over the fully collapsed
    normalized text (whitespace removed)."""

    docs = table(spark, sf_dir, "documents")
    collapsed = F.regexp_replace(norm_text(F.col("text")), " ", "")
    return docs.select("doc_id", F.md5(collapsed).alias("fp"))


QUERIES = {
    "text_token_count": token_count,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id,
    "text_lang_distribution": lang_id_distribution,
    "text_fingerprint": fingerprint,
}

_N = SQL_NORM.format(e="text")


def _occ_sql(word: str) -> str:
    needle = f" {word} "
    return (
        f"CAST((length(' ' || {_N} || ' ') - "
        f"length(replace(' ' || {_N} || ' ', '{needle}', ''))) / {len(needle)} AS INT)"
    )


_NT = f"CASE WHEN {_N} = '' THEN 0 ELSE len(string_split({_N}, ' ')) END"
_ALPHA = "length(regexp_replace(lower(text), '[^a-z]', '', 'g'))"
_C_EN, _C_ES, _C_DE, _C_FR = (_occ_sql(w) for w in ("the", "la", "der", "le"))
_BEST = f"greatest({_C_EN}, {_C_ES}, {_C_DE}, {_C_FR})"

ORACLES = {
    "text_token_count": f"SELECT doc_id, {_NT} AS n_tokens FROM documents",
    "text_quality_score": f"""
        SELECT doc_id,
               {_NT} AS n_tokens,
               round({_ALPHA} / greatest(length(text), 1), 6) AS alpha_ratio,
               round(({_occ_sql('the')} + {_occ_sql('of')} + {_occ_sql('and')})
                     / greatest({_NT}, 1), 6) AS stopword_ratio,
               round(least({_NT} / 100.0, 1.0) * ({_ALPHA} / greatest(length(text), 1)), 6)
                   AS quality
        FROM documents
    """,
    "text_lang_id": f"""
        SELECT doc_id,
               {_C_EN} AS c_en, {_C_ES} AS c_es, {_C_DE} AS c_de, {_C_FR} AS c_fr,
               CASE WHEN {_BEST} = 0 THEN 'und'
                    WHEN {_C_EN} = {_BEST} THEN 'en'
                    WHEN {_C_ES} = {_BEST} THEN 'es'
                    WHEN {_C_DE} = {_BEST} THEN 'de'
                    ELSE 'fr' END AS lang_pred
        FROM documents
    """,
    "text_lang_distribution": f"""
        SELECT lang_pred, count(*) AS n_docs FROM (
            SELECT CASE WHEN {_BEST} = 0 THEN 'und'
                        WHEN {_C_EN} = {_BEST} THEN 'en'
                        WHEN {_C_ES} = {_BEST} THEN 'es'
                        WHEN {_C_DE} = {_BEST} THEN 'de'
                        ELSE 'fr' END AS lang_pred
            FROM documents
        ) GROUP BY lang_pred
    """,
    "text_fingerprint": f"SELECT doc_id, md5(replace({_N}, ' ', '')) AS fp FROM documents",
}
