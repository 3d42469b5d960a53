"""Driver-mimicking differential test: every registered query with an
oracle runs on Spark AND DuckDB; row sets must match exactly (this is
the same compare the driver's CORRECTNESS gate performs, minus the
hashing). Mirrors the reference's own methodology — differential
testing against a trusted engine (`/root/reference/README.md:16-140`
does it against pandas' Cython) — upgraded to a real oracle."""

from __future__ import annotations

import pytest

from pandas_rust_algos_spark.plans import registry

from tests.conftest import assert_frames_match

registry._load_all()
_ORACLED = sorted(n for n, s in registry._REGISTRY.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in registry._REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", _ORACLED)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = registry.get(name)
    sdf = spec.fn(spark, sf_dir).toPandas()
    odf = duck.execute(spec.oracle).df()
    assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = registry.get(name)
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
