"""Local mirror of the driver's t2 compare: sort columns by name, sort rows,
compare values (exact for ints/strings, tolerant for floats)."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, duck_con, oracle: str, float_tol: float = 1e-6):
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con.execute(oracle).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        for i in range(len(g)):
            gv, wv = g.iloc[i], w.iloc[i]
            g_null = gv is None or (isinstance(gv, float) and math.isnan(gv)) or gv is pd.NaT
            w_null = wv is None or (isinstance(wv, float) and math.isnan(wv)) or wv is pd.NaT
            if g_null and w_null:
                continue
            if isinstance(gv, float) or isinstance(wv, float):
                assert math.isclose(float(gv), float(wv), rel_tol=float_tol, abs_tol=float_tol), (
                    f"{col}[{i}]: spark={gv!r} oracle={wv!r}"
                )
            else:
                assert gv == wv, f"{col}[{i}]: spark={gv!r} oracle={wv!r}"
    # The driver's actual gate hashes STRINGIFIED values — a column that
    # is numerically equal but dtype-divergent (DuckDB SUM(BIGINT) →
    # INT128 → pandas float64 vs Spark int64: "123.0" vs "123") passes
    # the tolerant loop above yet fails the driver. Mirror the strict
    # compare too so that trap is caught at sf0.001 in CI.
    g_str = sorted(tuple(str(v) for v in r) for r in got.itertuples(index=False))
    w_str = sorted(tuple(str(v) for v in r) for r in want.itertuples(index=False))
    assert g_str == w_str, (
        "driver-style stringified compare mismatch (dtype divergence? "
        "check int-vs-float column dtypes on both sides)"
    )
