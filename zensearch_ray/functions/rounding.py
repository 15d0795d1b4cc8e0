"""SQL-compatible rounding.

DuckDB's ROUND is half-away-from-zero; numpy's is half-to-even. Any
float column that is compared against a DuckDB oracle MUST use this
helper so value hashes agree (e.g. round(1/128, 6): DuckDB 0.007813,
numpy 0.007812). Verified empirically against DuckDB 1.0.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 6):
    """Element-wise round, ties away from zero — matches SQL ROUND."""
    s = 10.0**decimals
    arr = np.asarray(x, dtype=np.float64)
    out = np.where(arr >= 0, np.floor(arr * s + 0.5), np.ceil(arr * s - 0.5)) / s
    if np.isscalar(x) or arr.ndim == 0:
        return float(out)
    return out


def round6(x):
    return round_half_away(x, 6)
