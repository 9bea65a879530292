"""Result-verification semantics ported from the reference harness
(reference bdb_tools/utils.py:449-752) — the rules its golden-output
comparisons use, re-expressed over pandas frames:

* pseudo-equality  — shape equal, same column set, row-order insensitive,
  dtype-insensitive, ~6 significant digits on floats (utils.py:449-477).
* scalar closeness — np.allclose at decimal=5 (q04/q23 path,
  utils.py:730-740).
* sentiment overlap — ≥90% row overlap in both directions (q10/q18/q19,
  utils.py:584-613, threshold :643).
* clustering       — WSSSE ≤ reference or within 0.01% (utils.py:517-539).
* supervised       — metric ≥ reference or within 0.01% (utils.py:548-581).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out.reset_index(drop=True)


def pseudo_equal(
    result: pd.DataFrame,
    expected: pd.DataFrame,
    significant: int = 6,
) -> bool:
    """Order-insensitive, precision-tolerant frame equality
    (reference assert_dataframes_pseudo_equal, utils.py:449-477)."""
    if set(result.columns) != set(expected.columns):
        return False
    if len(result) != len(expected):
        return False
    a, b = _canon(result), _canon(expected)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            rel = 10.0 ** (1 - significant)
            if not (np.isclose(af, bf, rtol=rel, equal_nan=True) | both_nan).all():
                return False
        else:
            if not av.astype(object).where(pd.notna(av), None).equals(
                bv.astype(object).where(pd.notna(bv), None)
            ):
                return False
    return True


def scalars_close(result, expected, decimal: int = 5) -> bool:
    """Scalar-query comparison (reference utils.py:730-740)."""
    return bool(
        np.allclose(np.asarray(result, dtype=float),
                    np.asarray(expected, dtype=float),
                    atol=1.5 * 10.0 ** (-decimal)))


def sentiment_overlap(
    result: pd.DataFrame,
    expected: pd.DataFrame,
    threshold: float = 0.9,
) -> bool:
    """Fuzzy NLP-query comparison: ≥`threshold` of rows present in the
    other frame, both directions (reference utils.py:584-613)."""
    if result.empty and expected.empty:
        return True
    if result.empty or expected.empty:
        return False
    key_cols = sorted(set(result.columns) & set(expected.columns))
    r = {tuple(t) for t in result[key_cols].itertuples(index=False)}
    e = {tuple(t) for t in expected[key_cols].itertuples(index=False)}
    return (len(r & e) / len(e) >= threshold
            and len(r & e) / len(r) >= threshold)


def clustering_acceptable(
    wssse: float, reference_wssse: float, tolerance: float = 1e-4
) -> bool:
    """WSSSE must beat the reference or be within 0.01%
    (reference utils.py:517-539)."""
    if wssse <= reference_wssse:
        return True
    return math.isclose(wssse, reference_wssse, rel_tol=tolerance)


def metric_acceptable(
    metric: float, reference_metric: float, tolerance: float = 1e-4
) -> bool:
    """Supervised metric (precision/AUC/accuracy) must meet the reference
    or be within 0.01% (reference utils.py:548-581)."""
    if metric >= reference_metric:
        return True
    return math.isclose(metric, reference_metric, rel_tol=tolerance)
