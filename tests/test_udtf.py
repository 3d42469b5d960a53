"""Tests for the Python UDTF face (operators/udtf_ops.py): span
offsets must slice back to the hit, SQL LATERAL must compose, and the
UDTF hits must agree with the expression-path counts in scrub.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_rust_algos_spark.operators import scrub as sc
from pandas_rust_algos_spark.operators.udtf_ops import PIISpans, register_udtfs

_TXT = "mail a.b@x.io or c@d.org call 555-123-4567 host 10.1.0.2 end"


def test_spans_offsets_slice_back(spark):
    rows = PIISpans(F.lit(_TXT)).collect()
    assert len(rows) == 4
    for r in rows:
        assert _TXT[r["start"]:r["end"]] == r["hit"]
    kinds = sorted(r["kind"] for r in rows)
    assert kinds == ["email", "email", "ipv4", "phone"]


def test_null_text_yields_no_rows(spark):
    assert PIISpans(F.lit(None).cast("string")).count() == 0


def test_sql_lateral_and_expression_parity(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, _TXT), (2, "nothing here"), (3, None)], "id long, t string")
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT d.id, s.kind, s.hit, s.start, s.end "
        "FROM udtf_docs d, LATERAL pii_spans(d.t) s"
    )
    per_doc = (out.groupBy("id").pivot("kind").count().fillna(0))
    got = {r["id"]: r.asDict() for r in per_doc.collect()}
    # doc 2 has zero matches -> dropped by the inner LATERAL
    assert set(got) == {1}
    # expression path (scrub.pii_scrub) must agree on the counts
    exp = {r["id"]: r for r in sc.pii_scrub(df, "t").collect()}
    assert got[1]["email"] == exp[1]["n_email"] == 2
    assert got[1]["phone"] == exp[1]["n_phone"] == 1
    assert got[1]["ipv4"] == exp[1]["n_ipv4"] == 1


def test_register_idempotent(spark):
    register_udtfs(spark)
    register_udtfs(spark)
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM (SELECT * FROM pii_spans('x@y.zz'))"
    ).first()["n"] == 1
