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


def test_quality_gate_equals_stats_join(spark):
    # r14-opt: quality_gate replaces the curation compositions'
    # docs ⋈ repetition_stats.filter(quality_pass) self-join with an
    # in-place zero-shuffle filter — this pins the frame equality the
    # swap rests on (same rows, same columns), including the implicit
    # <2-word drop the stats frame's pre-filter used to apply.
    from gistdex_spark.operators.pipeline import quality_gate

    df = _docs(
        spark,
        [
            (1, "spam spam spam spam"),        # fails top_word_frac
            (2, "all words here differ now"),  # passes
            (3, "one"),                        # <2 words: dropped
            (4, "x y z w v u t s r q"),        # passes
            (5, "a a a a b c d e f g"),        # 0.4 top_word: fails
        ],
    )
    stats = repetition_stats(df)
    joined = df.join(
        stats.filter(F.col("quality_pass")).select("doc_id"), "doc_id"
    )
    gated = quality_gate(df)
    assert gated.columns == joined.columns
    assert sorted(map(tuple, gated.collect())) == sorted(
        map(tuple, joined.collect())
    )
    # and the gate really is shuffle-free: no exchange in its plan
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_metric_extra_cols_passthrough(spark):
    # r14-opt one-pass funnel metrics: extra_cols must pass base columns
    # through unchanged and leave the default schema byte-identical.
    from gistdex_spark.operators.textstats import (
        line_quality_gate,
        token_entropy,
    )

    df = _docs(spark, [(1, "a b c d e f g h"), (2, "k k k k k k k")])
    base = {r["doc_id"]: r for r in token_entropy(df).collect()}
    chained = line_quality_gate(
        token_entropy(df, extra_cols=("text",)), extra_cols=("entropy_bits",)
    )
    lq = {r["doc_id"]: r for r in line_quality_gate(df).collect()}
    for r in chained.collect():
        assert r["entropy_bits"] == base[r["doc_id"]]["entropy_bits"]
        assert r["kept_frac"] == lq[r["doc_id"]]["kept_frac"]
    assert token_entropy(df).columns == [
        "doc_id", "n_tokens", "n_types", "entropy_bits", "entropy_pass",
    ]


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


def test_remove_boilerplate_strips_frequent_lines(spark):
    from gistdex_spark.operators.pipeline import remove_boilerplate

    banner = "Accept cookies to continue"
    rows = [
        (1, f"unique alpha\n{banner}\nbody one"),
        (2, f"{banner}\nbody two"),
        (3, f"body three\n{banner}"),
        (4, "no banner here\nat all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in remove_boilerplate(df, min_df=3).collect()}
    assert out[1].clean_text == "unique alpha\nbody one"
    assert out[1].n_removed == 1
    assert out[2].clean_text == "body two"
    assert out[3].clean_text == "body three"
    assert out[4].clean_text == "no banner here\nat all"
    assert out[4].n_removed == 0


def test_remove_boilerplate_short_lines_kept(spark):
    from gistdex_spark.operators.pipeline import remove_boilerplate

    # "ok" appears everywhere but is under min_len → never boilerplate
    rows = [(i, "ok\ncontent %d" % i) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = remove_boilerplate(df, min_df=3, min_len=5).collect()
    assert all(r.n_removed == 0 for r in out)
    assert all(r.clean_text.startswith("ok\n") for r in out)


def test_remove_boilerplate_fully_scrubbed_doc_is_empty_string(spark):
    from gistdex_spark.operators.pipeline import remove_boilerplate

    rows = [(1, "same line"), (2, "same line"), (3, "same line")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = remove_boilerplate(df, min_df=3).collect()
    assert all(r.clean_text == "" and r.n_removed == 1 for r in out)


def test_resample_domains_copy_counts(spark):
    from gistdex_spark.operators.pipeline import resample_domains

    rows = [(i, "a" if i < 40 else "b") for i in range(80)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = resample_domains(df, {"a": 3000, "b": 0}).collect()
    per_id = {}
    for r in out:
        per_id.setdefault(r.doc_id, []).append(r.copy_idx)
    # b dropped entirely; every a doc appears exactly 3 times (3000 = 3.0x)
    assert set(per_id) == set(range(40))
    assert all(sorted(v) == [1, 2, 3] for v in per_id.values())


def test_resample_domains_fractional_rate_hits_expected_band(spark):
    from gistdex_spark.operators.pipeline import resample_domains

    rows = [(i, "a") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = resample_domains(df, {"a": 500}).collect()
    # md5 buckets are uniform: 0.5x of 400 docs ≈ 200, generous band
    assert 140 <= len(out) <= 260
    assert all(r.copy_idx == 1 for r in out)
    # deterministic: same inputs → same selection
    again = resample_domains(df, {"a": 500}).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)


def test_curation_observe_metrics(spark):
    """Observation counters must reconcile with the actual stage row
    counts without any extra scan jobs."""
    from gistdex_spark.operators.pipeline import curate_with_metrics
    from gistdex_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out, obs = curate_with_metrics(docs)
    n_out = out.count()  # final action; earlier counters may populate during construction (see docstring)
    n_in = obs["input"].get["n"]
    n_gated = obs["gated"].get["n"]
    n_kept = obs["kept"].get["n"]
    assert n_in == docs.count()
    assert n_in >= n_gated >= n_kept > 0
    assert n_kept == n_out


def test_weighted_sample_determinism_and_bias(spark):
    from gistdex_spark.operators.pipeline import weighted_sample

    rows = [(i, (i % 10) + 1) for i in range(1, 1001)]  # weights 1..10
    df = spark.createDataFrame(rows, schema="doc_id BIGINT, w INT")
    s1 = sorted(r["doc_id"] for r in weighted_sample(df, "w", 100).collect())
    s2 = sorted(
        r["doc_id"]
        for r in weighted_sample(df.repartition(7), "w", 100).collect()
    )
    assert s1 == s2, "sample must be partition-independent"
    assert len(s1) == 100
    # inclusion probability ∝ weight: the sample's mean weight must sit
    # well above the population mean (5.5); E-S with these weights gives
    # ~7+, so 6.0 is a loose, non-flaky floor for a deterministic sample
    wmap = dict(rows)
    assert sum(wmap[i] for i in s1) / 100 > 6.0


def test_weighted_sample_drops_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -3), (3, 5)], schema="doc_id BIGINT, w INT"
    )
    from gistdex_spark.operators.pipeline import weighted_sample

    got = [r["doc_id"] for r in weighted_sample(df, "w", 10).collect()]
    assert got == [3]


def test_dup_ngram_stats_flags_looped_doc(spark):
    from gistdex_spark.operators.pipeline import dup_ngram_stats

    looped = " ".join(["the quick brown fox jumps"] * 6)  # 30 tokens, 1 gram x26
    clean = "one two three four five six seven eight nine ten"
    short = "too few tokens"
    df = spark.createDataFrame(
        [("loop", looped), ("clean", clean), ("short", short)],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in dup_ngram_stats(df, n=5).collect()}
    # looped doc: the repeated 5-gram dominates -> high duplicate mass
    assert got["loop"].dup_char_frac > 0.5
    assert got["loop"].dup_gate is False
    # clean doc: all 5-grams unique
    assert got["clean"].dup_char_frac == 0.0
    assert got["clean"].dup_gate is True
    assert got["clean"].n_grams == 6  # 10 tokens -> 6 overlapping 5-grams
    # < n tokens: no grams, passes by convention
    assert got["short"].n_grams == 0
    assert got["short"].dup_char_frac == 0.0
    assert got["short"].dup_gate is True


def _unimax_reference(caps, budget):
    """Paper-order sequential loop in EXACT rational arithmetic (the
    paper's shares are real-valued): ascending cap, each language takes
    min(cap, remaining / langs_left). The operator floors each
    unsaturated share to an integer at the end, so the reference floors
    only on output — never mid-loop, which would leak the remainder to
    later languages and change who saturates."""
    from fractions import Fraction

    order = sorted(range(len(caps)), key=lambda k: caps[k])
    alloc = [0] * len(caps)
    remaining = Fraction(budget)
    for pos, k in enumerate(order):
        share = remaining / (len(caps) - pos)
        take = min(Fraction(caps[k]), share)
        alloc[k] = int(take)  # floor (take >= 0)
        remaining -= take
    return alloc


def test_unimax_matches_sequential_reference(spark):
    from gistdex_spark.operators.pipeline import unimax_allocation

    # langs engineered so two saturate and three water-fill at 7/10 cap=1
    rows = [
        (i, " ".join(["w"] * n), lang)
        for i, (lang, n) in enumerate(
            [("aa", 10), ("bb", 30), ("cc", 200), ("dd", 210), ("ee", 224)]
        )
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r["lang"]: (r["cap_tokens"], r["alloc_tokens"], r["epochs"])
        for r in unimax_allocation(
            docs, budget_frac=(7, 10), epochs_cap=1
        ).collect()
    }
    caps = [10, 30, 200, 210, 224]
    budget = sum(caps) * 7 // 10  # 471: unsat share 431/3, NOT an integer
    ref = _unimax_reference(caps, budget)
    for lang, cap, a in zip(["aa", "bb", "cc", "dd", "ee"], caps, ref):
        assert got[lang][0] == cap
        assert got[lang][1] == a, (lang, got[lang], a)
        assert got[lang][2] == (a * 1_000_000 // cap) / 1e6
    assert got["aa"][1] == 10 and got["bb"][1] == 30  # saturated
    assert len({got[lg][1] for lg in ("cc", "dd", "ee")}) == 1  # equal share


def test_unimax_char_budget_converts_by_own_fertility(spark):
    from gistdex_spark.operators.pipeline import unimax_allocation

    # xx: 3 tokens / 5 chars per doc; yy: 2 tokens / 9 chars per doc —
    # different fertility, so equal token allocations would give
    # different char budgets (exact floor: alloc * chars DIV tokens)
    docs = spark.createDataFrame(
        [(1, "a b c", "xx"), (2, "dddd eeee", "yy")],
        ["doc_id", "text", "lang"],
    )
    got = {
        r["lang"]: r
        for r in unimax_allocation(
            docs, budget_frac=(1, 2), epochs_cap=1, char_budget=True
        ).collect()
    }
    for lang in ("xx", "yy"):
        r = got[lang]
        assert r["char_budget"] == (
            r["alloc_tokens"] * r["chars_total"] // r["tokens"]
        )
    # without the flag, the column set is unchanged (back-compat)
    plain = unimax_allocation(docs, budget_frac=(1, 2), epochs_cap=1)
    assert "char_budget" not in plain.columns
    assert "chars_total" not in plain.columns


def test_unimax_budget_exceeds_caps_gives_full_epochs(spark):
    from gistdex_spark.operators.pipeline import unimax_allocation

    docs = spark.createDataFrame(
        [(1, "a b c", "xx"), (2, "d e", "yy")], ["doc_id", "text", "lang"]
    )
    # budget = 3x corpus at epochs_cap=2 -> every language takes its cap
    got = {
        r["lang"]: r
        for r in unimax_allocation(
            docs, budget_frac=(3, 1), epochs_cap=2
        ).collect()
    }
    assert got["xx"]["alloc_tokens"] == got["xx"]["cap_tokens"] == 6
    assert got["yy"]["alloc_tokens"] == got["yy"]["cap_tokens"] == 4
    assert got["xx"]["epochs"] == 2.0 and got["yy"]["epochs"] == 2.0


def _unimax_closed_form(caps, budget):
    """Pure-python transcription of the EXACT formula unimax_allocation
    encodes in Catalyst expressions (ascending-cap prefix test, integer-
    division share) — property-tested here against the paper's
    sequential loop so the algorithm itself is verified over a large
    random space without a Spark job per example (the Spark encoding is
    covered by the example-based tests above and oracle parity)."""
    order = sorted(range(len(caps)), key=lambda k: (caps[k], k))
    n = len(caps)
    c = 0
    j = 0      # saturated-prefix length
    cj = 0     # cumulative cap at j
    for pos, k in enumerate(order, start=1):
        c += caps[k]
        if caps[k] * (n - pos + 1) <= budget - (c - caps[k]):
            j, cj = pos, c
    share = (budget - cj) // max(n - j, 1)
    alloc = [0] * n
    for pos, k in enumerate(order, start=1):
        alloc[k] = caps[k] if pos <= j else share
    return alloc


def test_unimax_closed_form_property():
    import random

    rng = random.Random(6)
    for trial in range(20000):
        n = rng.randint(1, 12)
        caps = [rng.randint(0, 10**6) for _ in range(n)]
        total = sum(caps)
        budget = rng.randint(0, max(total + total // 3, 1))
        got = _unimax_closed_form(caps, budget)
        want = _unimax_reference(caps, budget)
        assert got == want, (caps, budget, got, want)


def test_epoch_shuffle_deterministic_and_in_range(spark):
    from gistdex_spark.operators.pipeline import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    a = sorted(map(tuple, epoch_shuffle(df, epochs=3, n_shards=8).collect()))
    b = sorted(map(tuple, epoch_shuffle(df, epochs=3, n_shards=8).collect()))
    assert a == b  # RNG-free: identical across invocations
    assert len(a) == 40 * 3  # one row per (doc, epoch)
    assert all(0 <= shard < 8 for _, _, shard in a)


def test_epoch_shuffle_epochs_are_independent_permutations(spark):
    """Different epochs must NOT reuse the same assignment — the whole
    point of keying the hash on the epoch."""
    from gistdex_spark.operators.pipeline import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    rows = epoch_shuffle(df, epochs=2, n_shards=8).collect()
    e0 = {r.doc_id: r.shard for r in rows if r.epoch == 0}
    e1 = {r.doc_id: r.shard for r in rows if r.epoch == 1}
    stayed = sum(1 for d in e0 if e0[d] == e1[d])
    # Independent 8-shard assignment keeps ~1/8 in place; identical
    # assignment would keep all 200. Anything under half is decisive.
    assert stayed < 100


def test_epoch_shuffle_rejects_zero_epochs(spark):
    import pytest as _pytest

    from gistdex_spark.operators.pipeline import epoch_shuffle

    df = spark.createDataFrame([(1,)], ["doc_id"])
    with _pytest.raises(ValueError):
        epoch_shuffle(df, epochs=0)


def test_interleave_order_round_robin_pattern(spark):
    """Sources a(3), b(2), c(1) ordered by (rr_round, source, id) give
    a1 b1 c1 a2 b2 a3 — short sources drop out of later rounds."""
    from gistdex_spark.operators.pipeline import interleave_order

    rows = [
        (1, "a"), (2, "a"), (3, "a"),
        (4, "b"), (5, "b"),
        (6, "c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = [
        (r.doc_id, r.source)
        for r in interleave_order(df)
        .orderBy("rr_round", "source", "doc_id")
        .collect()
    ]
    assert got == [(1, "a"), (4, "b"), (6, "c"), (2, "a"), (5, "b"), (3, "a")]


def test_gram_novelty_copy_scores_zero(spark):
    """Doc 1 introduces all its grams (novelty 1.0); doc 2 is a verbatim
    copy (novelty 0.0); doc 3 shares half its text with doc 1."""
    from gistdex_spark.operators.pipeline import gram_novelty

    first = " ".join(f"w{i}" for i in range(12))
    half_new = " ".join(f"w{i}" for i in range(6)) + " " + " ".join(
        f"x{i}" for i in range(6)
    )
    df = spark.createDataFrame(
        [(1, first), (2, first), (3, half_new)], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty)
           for r in gram_novelty(df, n=3).collect()}
    assert got[1] == (10, 10, 1.0)
    assert got[2] == (10, 0, 0.0)
    # doc 3: 10 trigrams, the first 4 (within w0..w5) already appeared
    # in doc 1; the 6 crossing into or inside x-tokens are new.
    assert got[3] == (10, 6, 0.6)


def test_global_row_index_matches_single_window(spark):
    """The two-phase range+offset index must reproduce the exact
    row_number a single-partition window would assign, descending
    order and ties included."""
    from pyspark.sql import functions as F

    from gistdex_spark.operators.pipeline import global_row_index

    rows = [(i, (i * 37) % 11) for i in range(200)]  # heavy key ties
    df = spark.createDataFrame(rows, ["id", "k"])
    got = {
        r.id: r.global_idx
        for r in global_row_index(
            df, [F.col("k").desc(), F.col("id").asc()], partitions=7
        ).collect()
    }
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == want


def test_global_row_index_single_materialized_exchange(spark):
    """The ranged frame is materialized once (eager localCheckpoint),
    and both branches read it — the downstream plan holds no
    rangepartitioning exchange, and the only single-partition window
    runs over the per-partition counts."""
    from pyspark.sql import functions as F

    from gistdex_spark.operators.pipeline import global_row_index

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 13).alias("k"))
    out = global_row_index(df, [F.col("k").asc(), F.col("id").asc()])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    assert "ExistingRDD" in plan


def test_global_row_index_wide_column_regression(spark):
    """The boundary-divergence regression: with a WIDE payload column
    that only the rank branch keeps, column pruning used to give the
    rank and count branches different range exchanges (different
    rdd.id-seeded boundary samples), producing indexes past n. The
    materialized form must stamp a dense 1..n permutation regardless of
    payload width or partition count."""
    from pyspark.sql import functions as F

    from gistdex_spark.operators.pipeline import global_row_index

    df = spark.range(5000).select(
        F.col("id"),
        F.concat(F.lit("x" * 200), F.col("id").cast("string")).alias("wide"),
    )
    out = global_row_index(df, ["id"], partitions=37)
    idx = sorted(r.global_idx for r in out.collect())
    assert idx == list(range(1, 5001))


def test_token_entropy_gate_behavior(spark):
    """Entropy extremes: a one-token-repeated doc scores 0 bits and
    fails the gate; a k-distinct uniform doc scores exactly log2(k)."""
    import math

    from gistdex_spark.operators.textstats import token_entropy

    rows = [
        (1, "spam " * 40),                                # 0 bits
        (2, " ".join(f"w{i}" for i in range(32))),        # log2(32) = 5
        (3, "a a b b c c d d"),                           # log2(4) = 2
        (4, ""),                                          # empty edge
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in token_entropy(df, gate_bits=4.45).collect()}
    assert got[1].entropy_bits == 0.0 and not got[1].entropy_pass
    assert got[2].entropy_bits == 5.0 and got[2].entropy_pass
    assert abs(got[3].entropy_bits - 2.0) < 1e-9 and not got[3].entropy_pass
    assert got[4].n_tokens == 0 and got[4].entropy_bits == 0.0
    assert math.isclose(got[2].entropy_bits, math.log2(32))


def test_line_quality_gate_drops_and_reassembles(spark):
    """Positive cases the corpus parity row can't show: a repetitive
    window and a short trailing window drop; survivors rebuild in
    order."""
    from gistdex_spark.operators.textstats import line_quality_gate

    # 7 distinct + 7 repeated + 2 trailing tokens -> lines: keep, drop
    # (distinct frac 1/7), drop (len 2 < 5).
    text = " ".join(f"w{i}" for i in range(7)) + " " + "dup " * 7 + "t1 t2"
    df = spark.createDataFrame(
        [(1, text), (2, "")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in line_quality_gate(df).collect()}
    assert (got[1].n_lines, got[1].n_kept) == (3, 1)
    assert got[1].clean_text == " ".join(f"w{i}" for i in range(7))
    assert got[1].kept_frac == round(1 / 3, 6)
    assert (got[2].n_lines, got[2].n_kept, got[2].clean_text) == (0, 0, "")


def test_line_quality_gate_partial_line_can_pass(spark):
    """A 5-token all-distinct trailing line passes both gates."""
    from gistdex_spark.operators.textstats import line_quality_gate

    text = " ".join(f"a{i}" for i in range(12))  # 7 + 5 tokens
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = line_quality_gate(df).collect()[0]
    assert (r.n_lines, r.n_kept) == (2, 2)
    assert r.clean_text == " ".join(f"a{i}" for i in range(7)) + "\n" + " ".join(
        f"a{i}" for i in range(7, 12)
    )


def test_oov_rate_against_known_vocab(spark):
    from gistdex_spark.operators.pipeline import oov_rate

    rows = [
        (1, "a a a b"),      # 'a' dominates the corpus
        (2, "a b z q"),      # two OOV tokens with top_k=2
        (3, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in oov_rate(df, top_k=2).collect()}
    # vocab = {a, b} (counts 4 and 2; z/q are singletons)
    assert (got[1].n_tokens, got[1].n_oov, got[1].oov_rate) == (4, 0, 0.0)
    assert (got[2].n_tokens, got[2].n_oov, got[2].oov_rate) == (4, 2, 0.5)
    assert (got[3].n_tokens, got[3].n_oov, got[3].oov_rate) == (0, 0, 0.0)


def test_pmi_counts_and_score(spark):
    """Hand-checkable PMI: 4 single-window docs, pair (x, y) co-occurs
    in 3 of 4 windows, x in 3, y in 4 -> pmi = log2(3*4/(3*4)) = 0."""
    import math

    from gistdex_spark.operators.pipeline import pmi_cooccurrence

    rows = [
        (1, "x y"),
        (2, "x y"),
        (3, "x y"),
        (4, "y z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.word_a, r.word_b): r
        for r in pmi_cooccurrence(df, min_pair_count=2, top_k=10).collect()
    }
    assert set(out) == {("x", "y")}
    r = out[("x", "y")]
    assert (r.c_ab, r.c_a, r.c_b) == (3, 3, 4)
    assert abs(r.pmi - round(math.log2(3 * 4 / (3 * 4)), 6)) < 1e-12
    # a pair is counted once per window even when a word repeats
    df2 = spark.createDataFrame([(1, "x x y"), (2, "x y")], ["doc_id", "text"])
    out2 = {
        (r.word_a, r.word_b): r.c_ab
        for r in pmi_cooccurrence(df2, min_pair_count=1, top_k=10).collect()
    }
    assert out2 == {("x", "y"): 2}


def test_global_prefix_sum_matches_single_window(spark):
    """Range-exchange prefix sum == the naive single-partition window,
    including zero values, duplicate-free total order, and every
    partition count (1, 3, 16 — more partitions than rows)."""
    import random as _r

    from pyspark.sql import Window

    from gistdex_spark.operators.pipeline import global_prefix_sum

    rng = _r.Random(5)
    rows = [(i, rng.randint(0, 9)) for i in range(40)]
    rows[7] = (7, 0)
    df = spark.createDataFrame(rows, "doc_id bigint, v bigint")
    want = {
        (r.doc_id, r.ps)
        for r in df.withColumn(
            "ps",
            F.coalesce(
                F.sum("v").over(
                    Window.orderBy("doc_id").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("bigint"),
        ).collect()
    }
    for p in (1, 3, 16):
        got = {
            (r.doc_id, r.prefix_sum)
            for r in global_prefix_sum(
                df, ["doc_id"], "v", partitions=p
            ).collect()
        }
        assert got == want, f"partitions={p}"


def test_sequence_packing_straddle_arithmetic(spark):
    """Hand-checked packing: capacity 10, docs of 4/8/3/10/0 tokens in
    doc_id order start at 0/4/12/15/25 — doc 2 (4..11) and doc 4
    (15..24) straddle; the empty doc never counts as straddling and is
    excluded from the rate denominator."""
    from gistdex_spark.operators.pipeline import sequence_packing_stats

    mk = lambda n: " ".join(f"w{i}" for i in range(n))
    rows = [
        (1, mk(4), "s0"),
        (2, mk(8), "s0"),
        (3, mk(3), "s1"),
        (4, mk(10), "s1"),
        (5, "", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        r.source: (r.n_docs, r.n_tokens, r.n_straddling, r.straddle_rate)
        for r in sequence_packing_stats(df, capacity=10).collect()
    }
    assert got["s0"] == (2, 12, 1, 0.5)
    assert got["s1"] == (3, 13, 1, 0.5)


def test_unigram_logprob_known_distribution(spark):
    """3 'a' + 1 'b' tokens: p(a)=0.75, p(b)=0.25; doc scores are exact
    log2 averages."""
    import math

    from gistdex_spark.operators.pipeline import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a"), (2, "a b")], "doc_id bigint, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.avg_log2p) for r in unigram_logprob(df).collect()}
    assert got[1] == (2, round(math.log2(0.75), 6))
    assert got[2] == (2, round((math.log2(0.75) + math.log2(0.25)) / 2, 6))


def test_shard_manifest_hand_computed_and_invariants(spark):
    """Hand-worked assignment at budget 10 over token counts
    4,8,3,10,0: starts are 0,4,12,15,25 -> shards 0,0,1,1,2. Shard 0
    carries docs 1-2 (12 tokens, span 0..12), shard 1 docs 3-4
    (13 tokens, span 12..25), shard 2 the empty doc 5 (0 tokens,
    span 25..25). Invariants: doc spans are contiguous and token spans
    tile the stream end to end."""
    from gistdex_spark.operators.pipeline import shard_manifest

    mk = lambda n: " ".join(f"w{i}" for i in range(n))
    rows = [
        (1, mk(4)), (2, mk(8)), (3, mk(3)), (4, mk(10)), (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.shard_id: (
            r.n_docs, r.doc_from, r.doc_to, r.n_tokens,
            r.token_start, r.token_end,
        )
        for r in shard_manifest(df, shard_tokens=10).collect()
    }
    assert got == {
        0: (2, 1, 2, 12, 0, 12),
        1: (2, 3, 4, 13, 12, 25),
        2: (1, 5, 5, 0, 25, 25),
    }
    # invariants on a larger frame: contiguous doc spans, tiling token
    # spans (each shard starts where the previous ended)
    big = spark.createDataFrame(
        [(i, mk((i * 7) % 13)) for i in range(100)],
        "doc_id bigint, text string",
    )
    man = sorted(
        shard_manifest(big, shard_tokens=37).collect(),
        key=lambda r: r.shard_id,
    )
    for a, b in zip(man, man[1:]):
        assert b.doc_from == a.doc_to + 1
        assert b.token_start >= a.shard_id * 37
    total = sum(r.n_tokens for r in man)
    assert man[-1].token_end == total
