"""As-of join semantics (operators/temporal.py): most-recent-prior match,
tie-at-equal-ts eligibility, and null when no prior right row. The
events-table path is oracle-checked against DuckDB's native ASOF JOIN in
test_oracle_parity (asof_purchase_view)."""

from datetime import datetime

from gistdex_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_picks_latest_prior_not_any(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "buy")], ["user_id", "ts", "what"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T08:00:00"), "early"),
            (1, _ts("2024-01-01T09:30:00"), "latest_prior"),
            (1, _ts("2024-01-01T11:00:00"), "after"),
        ],
        ["user_id", "ts", "tag"],
    )
    row = asof_join(left, right, on="user_id").first()
    assert row["r_tag"] == "latest_prior"


def test_asof_equal_ts_is_eligible(spark):
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t, "buy")], ["user_id", "ts", "what"])
    right = spark.createDataFrame([(1, t, "same_instant")], ["user_id", "ts", "tag"])
    assert asof_join(left, right, on="user_id").first()["r_tag"] == "same_instant"


def test_asof_no_prior_gives_null(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "buy")], ["user_id", "ts", "what"]
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "later"),
         (2, _ts("2024-01-01T09:00:00"), "other_user")],
        ["user_id", "ts", "tag"],
    )
    row = asof_join(left, right, on="user_id").first()
    assert row["r_tag"] is None and row["r_ts"] is None


def test_asof_keeps_every_left_row(spark):
    left = spark.createDataFrame(
        [(u, _ts(f"2024-01-01T10:0{i}:00"), i) for u in (1, 2) for i in range(5)],
        ["user_id", "ts", "n"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:02:30"), "x")], ["user_id", "ts", "tag"]
    )
    out = asof_join(left, right, on="user_id")
    assert out.count() == 10  # left join: nothing dropped or duplicated
    matched = out.filter("r_tag IS NOT NULL")
    assert sorted(r["n"] for r in matched.collect()) == [3, 4]


def test_interval_join_inclusive_bounds_and_cell_crossing(spark):
    from gistdex_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 200), (4, 99), (5, 201), (6, 1050)],
        ["pid", "us"],
    )
    # interval spans cells 10..20 at grid=10; second is single-cell
    ivals = spark.createDataFrame(
        [("a", 100, 200), ("b", 1050, 1050)], ["iv", "start_us", "end_us"]
    )
    got = sorted(
        (r["pid"], r["iv"])
        for r in interval_join(
            points, ivals, "us", "start_us", "end_us", grid=10
        ).collect()
    )
    # 100 and 200 are inclusive; 99/201 are out; 1050 hits the point interval
    assert got == [(1, "a"), (2, "a"), (3, "a"), (6, "b")]


def test_interval_join_no_duplicate_pairs(spark):
    from gistdex_spark.operators.temporal import interval_join

    # grid much smaller than the interval: the interval covers many cells
    # but each point still joins exactly once
    points = spark.createDataFrame([(i, i * 7) for i in range(100)], ["pid", "us"])
    ivals = spark.createDataFrame([("all", 0, 700)], ["iv", "start_us", "end_us"])
    out = interval_join(points, ivals, "us", "start_us", "end_us", grid=3)
    assert out.count() == out.select("pid").distinct().count()
