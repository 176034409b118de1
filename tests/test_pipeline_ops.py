"""Training-pipeline operators (operators/pipeline.py): positive-case PII
redaction, contamination semantics, and repetition-gate edge cases that the
synthetic corpus cannot exercise (oracle parity covers the corpus paths)."""

import pyspark.sql.functions as F

from gistdex_spark.operators.pipeline import (
    contamination,
    pii_redact,
    repetition_stats,
    shingle_set,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_redact_positive_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "card 4111111111111111 and pin 1234"),
            (3, "two a@b.io c@d.net ids 999999 888888"),
            (4, "clean text only"),
        ],
        ["id", "note"],
    )
    got = {
        r["id"]: r
        for r in pii_redact(df, "note").orderBy("id").collect()
    }
    assert got[1]["n_emails"] == 1 and got[1]["redacted"] == "mail [EMAIL] now"
    # 4-digit pin survives; 16-digit card is masked.
    assert got[2]["n_digit_runs"] == 1
    assert got[2]["redacted"] == "card [ID] and pin 1234"
    assert got[3]["n_emails"] == 2 and got[3]["n_digit_runs"] == 2
    assert got[3]["redacted"] == "two [EMAIL] [EMAIL] ids [ID] [ID]"
    assert got[4]["redacted"] == "clean text only"


def test_pii_email_masked_before_digit_run(spark):
    # A digit-heavy local-part must disappear into [EMAIL], not be
    # half-eaten by the digit-run pass.
    df = spark.createDataFrame([(1, "x 123456789@example.com y")], ["id", "note"])
    row = pii_redact(df, "note").first()
    assert row["redacted"] == "x [EMAIL] y"
    assert row["n_emails"] == 1


def test_shingle_set_dedupes_within_doc(spark):
    df = _docs(spark, [(1, "a b a b a b")])
    grams = sorted(r["gram"] for r in shingle_set(df, n=2).collect())
    assert grams == ["a b", "b a"]  # 5 occurrences, 2 distinct


def test_shingle_set_drops_short_docs(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c d")])
    assert shingle_set(df, n=4).select("doc_id").distinct().count() == 1


def test_contamination_counts_distinct_shared_shingles(spark):
    corpus = _docs(spark, [(1, "w x y z q"), (2, "p q r s t")])
    bench = _docs(spark, [(100, "w x y z k p")])
    # doc 1 shares "w x y" and "x y z"; doc 2 shares nothing (no 3-gram
    # of "p q r s t" appears in the benchmark text).
    got = {r["doc_id"]: r["hits"] for r in contamination(corpus, bench, n=3).collect()}
    assert got == {1: 2}


def test_repetition_stats_flags_degenerate_doc(spark):
    df = _docs(spark, [(1, "spam spam spam spam"), (2, "all words here differ")])
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["unique_frac"] == 0.25
    assert got[1]["top_word_frac"] == 1.0
    assert got[1]["top_bigram_frac"] == 1.0
    assert not got[1]["quality_pass"]
    assert got[2]["unique_frac"] == 1.0
    assert got[2]["top_bigram_frac"] == 1.0 / 3.0


def test_contamination_plan_broadcasts_benchmark(spark):
    corpus = _docs(spark, [(i, f"a b c d{i} e") for i in range(20)])
    bench = _docs(spark, [(99, "a b c d e")])
    plan = contamination(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan


def test_split_assign_deterministic_and_complete(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    from gistdex_spark.operators.pipeline import split_assign

    a = {r["doc_id"]: r["split"] for r in split_assign(df).collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(df).collect()}
    assert a == b  # same doc -> same split, every run
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 850 < c["train"] < 950  # ~90% of 1000


def test_sequence_pack_fills_packs_to_budget(spark):
    from gistdex_spark.operators.pipeline import sequence_pack

    df = spark.range(500).selectExpr("id AS doc_id", "100 AS tokens")
    packed = sequence_pack(df, budget=1000, n_buckets=4)
    sums = (
        packed.groupBy("bucket", "pack_id")
        .agg(F.sum("tokens").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    # Every doc starts inside its pack's [k*budget, (k+1)*budget) range,
    # so a pack holds ~budget tokens (overflow bounded by one doc).
    for r in sums:
        assert r["s"] <= 1000 + 100
    assert packed.select("pack_id").distinct().count() > 1


def test_quantize_zero_vector_guard_and_error_bound(spark):
    from gistdex_spark.operators.pipeline import quantize_int8_stats

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    got = {r["vec_id"]: r for r in quantize_int8_stats(df).collect()}
    assert got[2]["scale"] == 0.0 and got[2]["max_abs_err"] == 0.0
    # Quantization error of the in-range case is at most scale/2.
    assert got[1]["max_abs_err"] <= got[1]["scale"] / 2 + 1e-12
    assert abs(got[1]["scale"] - 1.0 / 127.0) < 1e-12
