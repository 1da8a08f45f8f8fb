"""Differential-compare helper approximating the driver's t2 gate.

Two layers, both asserted:

1. Forgiving row-wise comparison (column order by name, row order by full-row
   sort, floats at 12 significant digits, Decimal → float). On mismatch it
   reports the first differing rows — best for diagnosing real value bugs.

2. Driver-strict canonicalization: both result sets are rendered through
   pandas exactly the way the driver's correctness harness does (DuckDB via
   fetchdf(), Spark rows into a pandas frame), cells stringified
   dtype-sensitively, rows sorted, and the rendered tables compared. This is
   deliberately UNFORGIVING about representation: DuckDB HUGEINT surfacing as
   float64 ("0.0") vs Spark BIGINT ("0") is a mismatch here even though layer
   1 passes — because it is a mismatch in the driver's value hash too
   (observed in CORRECTNESS_r01: filter_null_semantics). Array/struct result
   columns raise immediately: they crash the driver's pandas sort_values
   (observed: agg_collect_sorted_list, "unhashable type: 'list'").
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import numpy as np
import pandas as pd


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


def _render_strict(v, name: str, col: str, side: str = "duck") -> str:
    """Stringify a pandas cell the way the driver's hash sees it: int64 0 and
    float64 0.0 are DIFFERENT. Arrays/structs are a hard error."""
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise AssertionError(
            f"{name}: column {col!r} is array/struct-valued — the driver's "
            "pandas canonicalizer crashes on these (unhashable type: 'list'). "
            "Serialize it (array_join / string_agg) per the registry rule."
        )
    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        if side == "spark":
            # A Spark-side Decimal means the query's output schema carries
            # DecimalType — the driver hashes its exact scale rendering
            # ('1341148.6071000') against DuckDB's float64 ('1341148.6071')
            # and goes red even when values match (CORRECTNESS_r04: 7
            # queries). Hard error, like arrays: fix the query, never coerce.
            raise AssertionError(
                f"{name}: column {col!r} is DecimalType on the SPARK side — "
                "the driver hash renders Decimal scale digits and mismatches "
                "DuckDB's float64. Cast to DOUBLE in-query (divide by an "
                "exponent literal like 1e4, or CAST(... AS DOUBLE))."
            )
        # DuckDB DECIMAL reaches pandas as Decimal objects; the driver sees
        # their float rendering.
        return repr(float(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "∅" if math.isnan(f) else repr(f)
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime.datetime):
        if pd.isna(v):
            return "∅"
        ts = pd.Timestamp(v)
        # DuckDB DATE surfaces from fetchdf() as a midnight datetime64 while
        # Spark DATE collects as datetime.date; the driver's hash treats them
        # as equal (fn_datetime was hash-green in round 1), so render
        # midnight timestamps date-only to match its tolerance.
        if ts.hour == ts.minute == ts.second == ts.microsecond == ts.nanosecond == 0:
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def _strict_table(
    pdf: pd.DataFrame, name: str, side: str = "duck"
) -> list[tuple[str, ...]]:
    # Render column-by-column: iterrows() would upcast a mixed int/float row
    # to a single dtype and silently erase exactly the distinction we check.
    cols = sorted(pdf.columns)
    rendered_cols = [
        [_render_strict(v, name, c, side) for v in pdf[c].tolist()] for c in cols
    ]
    rendered = sorted(zip(*rendered_cols)) if rendered_cols else []
    return [tuple(r) for r in rendered]


def assert_match(spark_df, duck_rel, name: str = "?") -> None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column names differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )

    # Layer 2 source data: DuckDB through fetchdf() — the same pandas
    # conversion the driver uses (HUGEINT → float64 happens HERE).
    d_pdf = duck_rel.fetchdf()
    d_rows = [tuple(r) for r in d_pdf.itertuples(index=False)]

    assert len(s_rows) == len(d_rows), (
        f"{name}: row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    )

    # Layer 1: forgiving, good diagnostics.
    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, [tuple(r) for r in duck_rel.fetchall()])
    for i, (a, b) in enumerate(zip(sn, dn)):
        assert a == b, (
            f"{name}: first row mismatch at sorted-row {i}:\n spark={a}\n duck ={b}"
        )

    # Layer 2: driver-strict rendering.
    s_pdf = pd.DataFrame(s_rows, columns=s_cols)
    st = _strict_table(s_pdf, name, side="spark")
    dt = _strict_table(d_pdf, name, side="duck")
    for i, (a, b) in enumerate(zip(st, dt)):
        assert a == b, (
            f"{name}: DRIVER-STRICT mismatch at sorted-row {i} "
            f"(cols sorted={sorted(s_cols)}):\n spark={a}\n duck ={b}\n"
            "Values agree at 12 sig digits but render differently in the "
            "driver's pandas hash (e.g. HUGEINT→float64 vs BIGINT). Add "
            "CAST(... AS BIGINT) / matching types on both sides."
        )
