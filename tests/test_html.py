"""HTML main-content extraction: DOM heuristics unit tests, the
distributed pipeline vs a serial re-implementation (span-for-span),
and physical-plan hygiene for the corpus-level boilerplate strip."""

from __future__ import annotations

import collections

import duckdb

from pdf_toolkit_spark.htmlx import (
    BOILER_MIN_DOCS,
    SLOGANS,
    extract_html_blocks,
    extract_html_document,
    html_from_text,
    site_of,
)
from pdf_toolkit_spark.spark.html_job import extract_html_spans
from pdf_toolkit_spark.spark.session import explain_str

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# DOM heuristics (serial kernel)
# ---------------------------------------------------------------------------

CONTENT = (
    "The quick brown fox jumps over the lazy dog while the band plays "
    "a long and entirely original melody for everyone present"
)


def test_script_style_head_are_dropped():
    blocks = extract_html_blocks(
        "<html><head><title>T</title><style>p{}</style>"
        f"<script>x=1</script></head><body><p>{CONTENT}</p></body></html>"
    )
    assert [b["kind"] for b in blocks] == ["text"]
    assert blocks[0]["text"] == CONTENT


def test_nav_footer_aside_dropped_by_tag():
    blocks = extract_html_blocks(
        f"<body><nav><a href='/'>Home is where we start from now</a></nav>"
        f"<p>{CONTENT}</p>"
        f"<footer><p>{CONTENT}</p></footer>"
        f"<aside><p>{CONTENT}</p></aside></body>"
    )
    assert len(blocks) == 1 and blocks[0]["text"] == CONTENT


def test_boiler_class_and_id_dropped():
    blocks = extract_html_blocks(
        f"<body><div class='sidebar'><p>{CONTENT}</p></div>"
        f"<div id='main-menu'><p>{CONTENT}</p></div>"
        f"<div class='story'><p>{CONTENT}</p></div></body>"
    )
    assert len(blocks) == 1


def test_link_dense_block_dropped_plain_block_kept():
    linky = "".join(
        f"<a href='/{i}'>A very clickable link label {i}</a> " for i in range(6)
    )
    blocks = extract_html_blocks(
        f"<body><ul><li>{linky}</li></ul><p>{CONTENT}</p></body>"
    )
    assert len(blocks) == 1 and blocks[0]["text"] == CONTENT


def test_short_block_dropped_heading_kept():
    blocks = extract_html_blocks(
        "<body><h2>Six words of heading here</h2><p>too short</p>"
        f"<p>{CONTENT}</p></body>"
    )
    assert [b["text"] for b in blocks] == ["Six words of heading here", CONTENT]


def test_images_inside_content_kept_inside_chrome_dropped():
    blocks = extract_html_blocks(
        "<body><nav><img src='logo.png'></nav>"
        f"<article><img src='fig1.png'><p>{CONTENT}</p></article></body>"
    )
    assert [(b["kind"], b["media_ref"]) for b in blocks] == [
        ("image", "fig1.png"),
        ("text", None),
    ]


def test_entities_round_trip_through_extraction():
    text = "Fish &amp; chips &lt;daily&gt; " + CONTENT
    blocks = extract_html_blocks(f"<body><p>{text}</p></body>")
    assert blocks[0]["text"] == "Fish & chips <daily> " + CONTENT


def test_unbalanced_close_tags_do_not_crash():
    blocks = extract_html_blocks(
        f"<body><div><p>{CONTENT}</div></p></span><p>{CONTENT}</p>"
    )
    assert sum(1 for b in blocks if b["kind"] == "text") == 2


def test_generator_chrome_never_leaks():
    """Every span the generator's page yields is heading, a content
    paragraph, an image, or the site slogan — never nav/sidebar/
    related/footer text."""

    text = " ".join(f"word{i} alpha beta gamma" for i in range(40))
    spans = extract_html_document(7, text)
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    assert texts[0] == " ".join(text.split()[:6])          # heading
    assert SLOGANS[site_of(7)] in texts                     # slogan (per-doc)
    for t in texts:
        assert "Category" not in t and "Top story" not in t
        assert "related article" not in t and "rights reserved" not in t
    imgs = [s["media_ref"] for s in spans if s["kind"] == "image"]
    assert imgs and all(m.startswith("img/site7/") for m in imgs)


# ---------------------------------------------------------------------------
# Distributed pipeline == serial pipeline, span for span
# ---------------------------------------------------------------------------

def _serial_spans() -> dict[str, list[tuple]]:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    cands = {int(i): extract_html_document(int(i), t) for i, t in rows}
    freq: dict[tuple, set] = collections.defaultdict(set)
    for did, spans in cands.items():
        for s in spans:
            if s["kind"] == "text":
                freq[(site_of(did), s["norm_text"])].add(did)
    boiler = {k for k, v in freq.items() if len(v) >= BOILER_MIN_DOCS}
    out = {}
    for did, spans in cands.items():
        kept = [
            s for s in spans
            if s["kind"] != "text" or (site_of(did), s["norm_text"]) not in boiler
        ]
        out[f"doc{did:06d}"] = [
            (s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(kept)
        ]
    return out


def test_distributed_equals_serial_spans(spark):
    expected = _serial_spans()
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in extract_html_spans(spark, SF_DIR).collect()
    }
    assert set(got) == set(expected)
    for doc_id in expected:
        assert got[doc_id] == expected[doc_id], doc_id


def test_site_slogan_is_stripped_corpus_wide(spark):
    rows = extract_html_spans(spark, SF_DIR).collect()
    slogans = set(SLOGANS)
    for r in rows:
        for s in r["spans"]:
            assert s["text"] not in slogans


# ---------------------------------------------------------------------------
# Plan hygiene
# ---------------------------------------------------------------------------

def test_parse_stage_executes_once(spark):
    """The records relation feeds four plan branches; the persist in
    extract_html_spans must keep the DOM-parse UDF to ONE execution
    (500 docs parsed exactly once, not once per branch)."""

    from pyspark.sql import functions as F

    from pdf_toolkit_spark.spark import html_job

    # Consume the spans column: a bare count() lets Catalyst eliminate
    # the left join (spans is distinct on doc_id), skipping the parse.
    n_spans = (
        extract_html_spans(spark, SF_DIR)
        .agg(F.sum(F.size("spans")).alias("n"))
        .collect()[0]["n"]
    )
    assert n_spans > 0
    assert html_job.parse_docs_acc.value == 500
    plan = explain_str(extract_html_spans(spark, SF_DIR))
    assert "InMemoryTableScan" in plan


def test_strip_anti_join_is_broadcast_not_hinted(spark):
    plan = explain_str(extract_html_spans(spark, SF_DIR))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    extended = explain_str(extract_html_spans(spark, SF_DIR), "extended")
    assert "ResolvedHint" not in extended and "UnresolvedHint" not in extended
    # exactly one Python boundary: the Arrow-batched DOM-parse stage
    assert "BatchEvalPython" not in plan
