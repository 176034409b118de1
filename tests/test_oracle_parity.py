"""Mirror of the driver's t2 correctness gate: run every registered query on
Spark AND its DuckDB oracle at sf0.01, compare row count, column names, and
values (order-insensitive, columns sorted by name)."""

from __future__ import annotations

import pytest

from gistdex_spark.parity import canon as _canon
from tests.conftest import SF_CORRECTNESS


def _query_names():
    from gistdex_spark.queries import ORACLES, REGISTRY

    return [(n, n in ORACLES) for n in REGISTRY]


def _recall_checks():
    """Value-level floors for the quantization queries a SQL oracle can't
    reproduce directly: recall@10 of the ANN result vs DuckDB's own exact
    kNN over the same parquet. Thresholds mirror the unit suites
    (test_pq.py >= 0.8, test_ivf.py >= 0.6 at nprobe=2/8)."""
    from gistdex_spark.queries import QN_MAIN, QV_MAIN, sql_cos

    exact_main = (
        f"SELECT vec_id FROM embeddings "
        f"ORDER BY {sql_cos('embedding', QV_MAIN, QN_MAIN)} DESC, vec_id "
        f"LIMIT 10"
    )
    exact_vec7 = """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7)
        SELECT vec_id FROM embeddings, q
        ORDER BY list_cosine_similarity(embedding, qv) DESC, vec_id
        LIMIT 10
    """
    return {
        "ann_pq_search": (exact_main, 0.8),
        "ann_ivf_trained": (exact_vec7, 0.6),
        # Composed approximations (cell pruning + code distortion) on the
        # hash-embedding hard case — floor below the single-approx gates.
        "ann_ivfpq_search": (exact_main, 0.5),
    }


@pytest.mark.parametrize("name", [n for n, _ in _query_names()])
def test_parity(name, spark, duck):
    from gistdex_spark.queries import ORACLES, REGISTRY

    sdf = REGISTRY[name](spark, SF_CORRECTNESS).toPandas()
    if name not in ORACLES:
        # Deterministic-but-not-SQL-expressible queries (the BPE token
        # family) carry frozen canon frames instead — the same full
        # value gate make_parity applies (check: values_pinned).
        import json
        import os

        pin_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures",
            "pinned_expected_sf0.01.json",
        )
        with open(pin_path) as f:
            pins = json.load(f)
        if name in pins:
            from gistdex_spark.parity import compare_pinned

            rec = compare_pinned(sdf, pins[name])
            assert rec["values_match"], (name, rec["first_mismatches"])
            return
        checks = _recall_checks()
        assert name in checks, (
            f"{name} has neither a SQL oracle, a pinned frame, nor a "
            "recall check — every registry query needs a value-level gate"
        )
        sql, floor = checks[name]
        exact = set(duck.sql(sql).df()["vec_id"])
        got = set(sdf["vec_id"])
        recall = len(got & exact) / len(exact)
        assert recall >= floor, f"{name}: recall@10 {recall} below {floor}"
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


def test_pinned_frame_compare_roundtrip_and_mismatch():
    """to_pinned -> compare_pinned must round-trip green, and a single
    perturbed value, a dropped row, or a renamed column must each flip
    the corresponding boolean — the pin is a real value gate, not a
    formality."""
    import pandas as pd

    from gistdex_spark.parity import compare_pinned, to_pinned

    df = pd.DataFrame(
        {"vec_id": [3, 1, 2], "score": [0.25, 1.0, float("nan")]}
    )
    pin = to_pinned(df)
    assert compare_pinned(df, pin)["values_match"]
    # order-insensitive
    assert compare_pinned(df.iloc[::-1], pin)["values_match"]
    # value perturbation beyond 6 dp
    bad = df.copy()
    bad.loc[0, "score"] = 0.2500011
    rec = compare_pinned(bad, pin)
    assert not rec["values_match"] and rec["first_mismatches"]
    # dropped row
    rec = compare_pinned(df.iloc[:2], pin)
    assert not rec["rows_match"]
    # renamed column
    rec = compare_pinned(df.rename(columns={"score": "sim"}), pin)
    assert not rec["schema_match"]
