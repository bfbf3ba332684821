"""Driver-shaped result comparison, shared by tests/conftest.py and
scripts/sweep_cost.py.

The driver compares a Spark result against its DuckDB oracle by
sorting columns by name, sorting rows by all values, then hashing the
values. ``frames_match`` reproduces that comparison (with an exact
float compare by default — anything needing tolerance must be rounded
in BOTH queries upstream) and raises ``AssertionError`` with a
pointed message on the first difference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all values — the driver's
    order-insensitive comparison shape."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def frames_match(
    got: pd.DataFrame, want: pd.DataFrame, float_rtol: float = 0.0
) -> None:
    """Raise AssertionError unless ``got`` equals ``want`` under the
    driver's order-insensitive, null-safe comparison."""
    got = normalize_frame(got)
    want = normalize_frame(want)
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            gv = g.astype(float).to_numpy()
            wv = w.astype(float).to_numpy()
            both_nan = np.isnan(gv) & np.isnan(wv)
            close = np.isclose(gv, wv, rtol=float_rtol, atol=0.0)
            bad = ~(both_nan | close)
            assert not bad.any(), (
                f"column {c}: {bad.sum()} mismatches, first: "
                f"{gv[bad][:3]} vs {wv[bad][:3]}"
            )
        else:
            eq = g.reset_index(drop=True).eq(w.reset_index(drop=True)) | (
                g.isna().reset_index(drop=True) & w.isna().reset_index(drop=True)
            )
            assert eq.all(), (
                f"column {c}: first mismatch at {int((~eq).idxmax())}: "
                f"{g[~eq.values].head(3).tolist()} vs {w[~eq.values].head(3).tolist()}"
            )
