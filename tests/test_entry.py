"""Driver-contract smoke tests: entry() runs, returns rows with the
declared schema; queries()/oracle_sql() are consistent."""

from __future__ import annotations


def test_entry_returns_spans(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert [f.name for f in df.schema.fields] == ["doc_id", "spans"]
    rows = df.limit(5).collect()
    assert rows
    span = rows[0]["spans"][0]
    assert set(span.asDict()) == {"kind", "text", "media_ref", "offset"}


def test_contract_keys_are_consistent():
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q), "oracle without a query"
    assert len(q) >= 20
    # the only non-oracle op is the genuinely non-SQL one
    assert set(q) - set(o) == {"extract_spans"}


def test_extract_spans_query_runs(spark):
    import __spark_entry__ as E

    df = E.queries()["extract_spans"](spark, "/root/testdata/sf0.001")
    row = df.orderBy("doc_id").first()
    assert row["n_spans"] == row["n_text_spans"] + row["n_image_spans"]
    assert row["n_spans"] > 0
