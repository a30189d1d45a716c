from __future__ import annotations

import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

engine.load_all()


def test_flagship_runs_and_is_top10(spark, sf_dir):
    df = engine.QUERIES["flagship_q3_topk"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert df.columns == ["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_registry_keys_have_callables(spark):
    import __spark_entry__ as e

    qs = e.queries()
    assert "flagship_q3_topk" in qs
    for k in e.oracle_sql():
        assert k in qs, f"oracle without query: {k}"
