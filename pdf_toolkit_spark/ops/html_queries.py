"""Driver-contract queries for the HTML extraction surface
(htmlx.py + spark/html_job.py) with EXACT DuckDB oracles.

The fixture generator is deterministic in (doc_id, text), so the
expected output of the whole pipeline — DOM heuristics AND the
corpus-level boilerplate strip — is derivable from the raw
``documents`` table in pure SQL: the oracle re-computes the candidate
span set analytically (heading / 30-word paragraphs / per-site slogan
/ periodic images) and applies the same >= BOILER_MIN_DOCS frequency
rule. If any DOM heuristic regressed (nav leaking through, a content
paragraph misclassified), the counts would diverge and the oracle
check fails — the generator's chrome is ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..htmlx import (
    BOILER_MIN_DOCS,
    HEAD_WORDS,
    IMG_EVERY,
    IMG_PHASE,
    MIN_CONTENT_NORM,
    N_SITES,
    PARA_WORDS,
    SLOGANS,
)
from ..spark.html_job import boilerplate_keys, extract_html_spans, html_records


def html_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar projection of the full HTML pipeline output: per-doc
    span counts by kind (stable, hashable columns for the driver)."""

    spans = extract_html_spans(spark, sf_dir)
    is_text = lambda s: s["kind"] == F.lit("text")  # noqa: E731
    return spans.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.size(F.filter("spans", is_text)).alias("n_text_spans"),
        (F.size("spans") - F.size(F.filter("spans", is_text))).alias("n_image_spans"),
    )


def html_boilerplate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-strip internals: (site, norm_text, n_docs) for every
    span the frequency rule classifies as site chrome."""

    return boilerplate_keys(html_records(spark, sf_dir))


QUERIES = {
    "html_extract_spans": html_extract_spans,
    "html_boilerplate_keys": html_boilerplate_keys,
}

_SLOGAN_VALUES = ", ".join(
    "({}, '{}')".format(s, SLOGANS[s].replace("'", "''")) for s in range(N_SITES)
)

#: Shared CTE chain: documents -> candidate text spans (post per-doc
#: heuristics, pre corpus strip) -> boiler keys. Constants interpolate
#: from the SAME Python values the generator/extractor use.
_SQL_CANDS = f"""
WITH docs AS (
    SELECT doc_id AS id,
           doc_id % {N_SITES} AS site,
           trim(text) AS t,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
           regexp_split_to_array(trim(text), '\\s+') AS w
    FROM documents
),
docs2 AS (
    SELECT *, GREATEST(1, CAST(ceil(n_words / {PARA_WORDS}.0) AS INT)) AS n_paras
    FROM docs
),
headings AS (
    SELECT id, site,
           trim(regexp_replace(lower(array_to_string(w[1:{HEAD_WORDS}], ' ')),
                               '[^a-z0-9]+', ' ', 'g')) AS nt
    FROM docs2 WHERE n_words > 0
),
paras AS (
    SELECT d.id, d.site,
           trim(regexp_replace(lower(array_to_string(
               d.w[(gs.i * {PARA_WORDS} + 1):((gs.i + 1) * {PARA_WORDS})], ' ')),
               '[^a-z0-9]+', ' ', 'g')) AS nt
    FROM docs2 d,
         LATERAL (SELECT unnest(generate_series(0, d.n_paras - 1)) AS i) gs
),
slogans(site, slogan) AS (VALUES {_SLOGAN_VALUES}),
cands AS (
    SELECT id, site, nt FROM headings WHERE nt <> ''
    UNION ALL
    SELECT id, site, nt FROM paras WHERE length(nt) >= {MIN_CONTENT_NORM}
    UNION ALL
    SELECT d.id, d.site,
           trim(regexp_replace(lower(s.slogan), '[^a-z0-9]+', ' ', 'g')) AS nt
    FROM docs2 d JOIN slogans s ON s.site = d.site
),
boiler AS (
    SELECT site, nt, count(DISTINCT id) AS n_docs
    FROM cands GROUP BY site, nt
    HAVING count(DISTINCT id) >= {BOILER_MIN_DOCS}
)
"""

ORACLES = {
    "html_boilerplate_keys": _SQL_CANDS + """
        SELECT site, nt AS norm_text, n_docs FROM boiler
    """,
    "html_extract_spans": _SQL_CANDS + f"""
        , kept AS (
            SELECT c.id, count(*) AS n_text
            FROM cands c
            WHERE NOT EXISTS (
                SELECT 1 FROM boiler b
                WHERE b.site = c.site AND b.nt = c.nt
            )
            GROUP BY c.id
        ),
        imgs AS (
            SELECT d.id,
                   count(*) FILTER (WHERE gs.i % {IMG_EVERY} = {IMG_PHASE}) AS n_img
            FROM docs2 d,
                 LATERAL (SELECT unnest(generate_series(0, d.n_paras - 1)) AS i) gs
            GROUP BY d.id
        )
        SELECT 'doc' || lpad(d.id::VARCHAR, 6, '0') AS doc_id,
               CAST(COALESCE(k.n_text, 0) + i.n_img AS INT) AS n_spans,
               CAST(COALESCE(k.n_text, 0) AS INT) AS n_text_spans,
               CAST(i.n_img AS INT) AS n_image_spans
        FROM docs2 d
        LEFT JOIN kept k ON k.id = d.id
        JOIN imgs i ON i.id = d.id
    """,
}
