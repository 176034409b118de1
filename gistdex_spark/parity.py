"""Shared Spark-vs-DuckDB compare used by both the in-repo parity suite
(tests/test_oracle_parity.py) and the per-round artifact generator
(make_parity.py) — the driver's own compare semantics: row count, sorted
column names, and values stringified at 6 dp, order-insensitive.
"""

from __future__ import annotations

import math
from typing import Any


def canon(df) -> tuple[list[str], list[tuple]]:
    """(sorted column names, rows sorted by stringified values) for a
    pandas DataFrame."""
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        canon_row = []
        for v in rec:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    canon_row.append(f"{v:.6f}")
            elif hasattr(v, "item"):  # numpy scalar
                item = v.item()
                canon_row.append(
                    f"{item:.6f}" if isinstance(item, float) else str(item)
                )
            else:
                canon_row.append(str(v))
        rows.append(tuple(canon_row))
    rows.sort()
    return cols, rows


def compare(sdf, ddf) -> dict[str, Any]:
    """Per-query record: rows/schema/values booleans + counts + first
    mismatches (empty when green)."""
    s_cols, s_rows = canon(sdf)
    d_cols, d_rows = canon(ddf)
    rows_match = len(s_rows) == len(d_rows)
    schema_match = s_cols == d_cols
    mismatches = (
        [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if rows_match and schema_match
        else []
    )
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "values_match": rows_match and schema_match and not mismatches,
        "spark_rows": len(s_rows),
        "oracle_rows": len(d_rows),
        "first_mismatches": [
            {"row": i, "spark": list(a), "oracle": list(b)}
            for i, a, b in mismatches[:3]
        ],
    }


def to_pinned(df) -> dict[str, Any]:
    """Serializable expected-frame pin: the canon form (sorted columns,
    rows sorted by 6-dp stringified values). Used for queries whose
    semantics are deterministic but not SQL-expressible (seeded k-means
    training), where a DuckDB oracle can't reproduce the frame but a
    frozen one can."""
    cols, rows = canon(df)
    return {"cols": cols, "rows": [list(r) for r in rows]}


def compare_pinned(sdf, pinned: dict[str, Any]) -> dict[str, Any]:
    """compare() against a stored pin instead of a live oracle frame."""
    s_cols, s_rows = canon(sdf)
    p_cols = list(pinned["cols"])
    p_rows = [tuple(r) for r in pinned["rows"]]
    rows_match = len(s_rows) == len(p_rows)
    schema_match = s_cols == p_cols
    mismatches = (
        [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, p_rows)) if a != b]
        if rows_match and schema_match
        else []
    )
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "values_match": rows_match and schema_match and not mismatches,
        "spark_rows": len(s_rows),
        "oracle_rows": len(p_rows),
        "first_mismatches": [
            {"row": i, "spark": list(a), "pinned": list(b)}
            for i, a, b in mismatches[:3]
        ],
    }
