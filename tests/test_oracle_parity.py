"""Mirror of the driver's t2 correctness gate: run every registered query on
Spark AND its DuckDB oracle at sf0.01, compare row count, column names, and
values (order-insensitive, columns sorted by name)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_CORRECTNESS


def _canon(df) -> tuple[list[str], list[tuple]]:
    """(sorted column names, rows sorted by stringified values)."""
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


def _query_names():
    from gistdex_spark.queries import ORACLES, REGISTRY

    return [(n, n in ORACLES) for n in REGISTRY]


@pytest.mark.parametrize("name", [n for n, _ in _query_names()])
def test_parity(name, spark, duck):
    from gistdex_spark.queries import ORACLES, REGISTRY

    sdf = REGISTRY[name](spark, SF_CORRECTNESS).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check for non-SQL-expressible ops
        return
    ddf = duck.sql(ORACLES[name]).df()
    s_cols, s_rows = _canon(sdf)
    d_cols, d_rows = _canon(ddf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
