from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_rust_algos_spark.session import get_spark
from pandas_rust_algos_spark.sources import TABLES

SF_TEST = os.environ.get("PRA_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pra-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_TEST


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style normalization: columns sorted by name, rows sorted
    by all columns, index dropped; timestamps tz-stripped."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            try:
                pdf[c] = pdf[c].dt.tz_localize(None)
            except TypeError:
                pass
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort", na_position="last")
    return pdf.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs "
        f"{sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"{name}: float col {c} differs at row {bad}: "
                    f"{av[bad]!r} vs {bv[bad]!r} "
                    f"(maxdiff={(av - bv).abs().max()})"
                )
        else:
            if not av.astype(object).where(pd.notna(av), None).equals(
                bv.astype(object).where(pd.notna(bv), None)
            ):
                neq = av.astype(object).where(pd.notna(av), None) != \
                    bv.astype(object).where(pd.notna(bv), None)
                bad = neq.idxmax()
                raise AssertionError(
                    f"{name}: col {c} ({av.dtype}/{bv.dtype}) differs at row "
                    f"{bad}: {av[bad]!r} vs {bv[bad]!r}"
                )
