"""CI pins for the local gate's driver-canonicalization replica.

tools/check_oracle.py replays the external driver's compare path:
results go through pandas (Spark ``toPandas`` vs DuckDB ``.df()``),
columns sort by name, ``sort_values`` runs over all columns, values
hash.  Round 9 proved exact python-object equality is NOT sufficient
— three keys passed it locally and failed at the driver.  These pins
freeze the two failure modes (and the one known driver coercion) so
the gate itself can't regress.  Pure pandas — no Spark session.
"""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import os

import numpy as np
import pandas as pd
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py"),
)
co = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(co)


def test_ndarray_cells_fail_canonicalization():
    """r9 driver-err shape: ArrayType columns land as ndarray cells via
    toPandas and the driver's sort_values raises TypeError."""
    spark_like = pd.DataFrame(
        {"id": [1, 2], "features": [np.array([1, 2]), np.array([3, 4])]}
    )
    duck_like = pd.DataFrame({"id": [1, 2], "features": ["1,2", "3,4"]})
    err = co.driver_canon_check(spark_like, duck_like)
    assert err is not None and "not driver-canonicalizable" in err


def test_decimal_vs_float_class_divergence_fails():
    """r9 hash-fail shape: Spark DecimalType -> object Decimal cells,
    DuckDB DECIMAL -> float64; equal values, diverged driver hashes."""
    spark_like = pd.DataFrame({"x": [decimal.Decimal("36000000")]})
    duck_like = pd.DataFrame({"x": [36000000.0]})
    err = co.driver_canon_check(spark_like, duck_like)
    assert err is not None and "type-class diverges" in err


def test_date_vs_datetime_is_one_class():
    """Driver-green evidence: 7 registry keys emit Spark DATE (object
    datetime.date) vs DuckDB DATE (datetime64[ns]) and all hold strong
    driver verdicts — temporal types are coerced, not diverged."""
    spark_like = pd.DataFrame({"d": [datetime.date(2024, 1, 1)]})
    duck_like = pd.DataFrame({"d": [pd.Timestamp("2024-01-01")]})
    assert co.driver_canon_check(spark_like, duck_like) is None


def test_int_width_is_one_class():
    spark_like = pd.DataFrame({"n": pd.array([1, 2], dtype="int32")})
    duck_like = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    assert co.driver_canon_check(spark_like, duck_like) is None


def test_clean_frames_pass():
    f = pd.DataFrame({"a": [1], "b": ["x"], "c": [1.5]})
    assert co.driver_canon_check(f, f.copy()) is None


def test_all_null_column_is_neutral():
    spark_like = pd.DataFrame({"x": [None, None]})
    duck_like = pd.DataFrame({"x": [np.nan, np.nan]})
    assert co.driver_canon_check(spark_like, duck_like) is None
