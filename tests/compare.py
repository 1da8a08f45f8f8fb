"""Differential-compare helper approximating the driver's t2 gate.

Normalizes both result sets (column order by name, row order by full-row sort,
floats rounded defensively at 9 dp to absorb representation noise, timestamps/
dates to ISO strings, Decimal → float) and asserts equality. Stricter than a
hash in one way: on mismatch it reports the first differing rows.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: enough to distinguish real mismatches,
        # forgiving of float32/float64 representation differences.
        return float(f"{v:.12g}")
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def assert_match(spark_df, duck_rel, name: str = "?") -> None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_rows = duck_rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column names differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        assert a == b, (
            f"{name}: first row mismatch at sorted-row {i}:\n spark={a}\n duck ={b}"
        )
