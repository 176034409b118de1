"""SemDeDup invariants: survivor set correctness and the within-cluster
candidate bound (the operator never compares across clusters)."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return 0.0 if na == 0 or nb == 0 else d / (na * nb)


@pytest.fixture(scope="module")
def verdicts(spark):
    from gistdex_spark.operators.ivf import first_c_centroids
    from gistdex_spark.operators.semdedup import semdedup
    from gistdex_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = first_c_centroids(emb, 4)
    out = semdedup(emb, cents, threshold=0.35).collect()
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    return out, vecs


def test_every_vector_gets_a_verdict(verdicts, spark):
    out, vecs = verdicts
    assert len(out) == len(vecs)
    assert {r["vec_id"] for r in out} == set(vecs)


def test_survivors_match_reference_rule(verdicts):
    """Brute-force the rule per cluster: pruned iff a lower-sorted
    (cos_centroid, id) neighbour scores >= threshold."""
    out, vecs = verdicts
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for rows in by_cluster.values():
        for a, b in itertools.permutations(rows, 2):
            # a sorts lower than b and they are near-dups -> b pruned
            if (a["cos_centroid"], a["vec_id"]) < (b["cos_centroid"], b["vec_id"]):
                if round(_cos(vecs[a["vec_id"]], vecs[b["vec_id"]]), 6) >= 0.35:
                    assert b["pruned"], (a["vec_id"], b["vec_id"])
    # and the converse: every pruned row has such a witness
    for rows in by_cluster.values():
        for b in rows:
            if b["pruned"]:
                assert any(
                    (a["cos_centroid"], a["vec_id"])
                    < (b["cos_centroid"], b["vec_id"])
                    and round(_cos(vecs[a["vec_id"]], vecs[b["vec_id"]]), 6) >= 0.35
                    for a in rows
                    if a["vec_id"] != b["vec_id"]
                ), b["vec_id"]


def test_most_peripheral_member_always_survives(verdicts):
    out, _ = verdicts
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for rows in by_cluster.values():
        low = min(rows, key=lambda r: (r["cos_centroid"], r["vec_id"]))
        assert not low["pruned"]


def test_no_cross_cluster_pruning(spark):
    """Two identical vectors forced into different clusters must BOTH
    survive — candidate generation is strictly within-cluster."""
    from gistdex_spark.operators.semdedup import semdedup

    emb = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.0, 1.0])],
        schema="vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.1]), (1, [0.1, 1.0])],
        schema="c_id BIGINT, c_vec ARRAY<DOUBLE>",
    )
    out = {r["vec_id"]: r for r in semdedup(emb, cents, threshold=0.9).collect()}
    assert out[10]["cluster"] == 0 and not out[10]["pruned"]
    # 11 and 12 are identical and share cluster 1: exactly one pruned,
    # and the survivor is the lower id (equal cos_centroid, id tiebreak).
    assert out[11]["cluster"] == 1 and out[12]["cluster"] == 1
    assert not out[11]["pruned"] and out[12]["pruned"]


def test_max_cluster_size_rank_buckets_the_pair_work(spark):
    """max_cluster_size sub-splits an oversize cluster by (cos_centroid,
    id) rank: pairs only form inside a sub-bucket, so with five identical
    vectors and cap=2 the buckets are [10,11],[12,13],[14] and the
    survivors are the bucket heads {10, 12, 14} — the deterministic
    capped semantics the SQL oracles mirror. With the cap at or above
    the cluster population the verdict must be bit-identical to
    uncapped."""
    from gistdex_spark.operators.semdedup import semdedup

    emb = spark.createDataFrame(
        [(i, [0.0, 1.0]) for i in range(10, 15)],
        schema="vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    cents = spark.createDataFrame(
        [(0, [0.1, 1.0])], schema="c_id BIGINT, c_vec ARRAY<DOUBLE>"
    )
    capped = {
        r["vec_id"]: r["pruned"]
        for r in semdedup(emb, cents, threshold=0.9, max_cluster_size=2).collect()
    }
    assert capped == {10: False, 11: True, 12: False, 13: True, 14: False}
    wide = {
        r["vec_id"]: r["pruned"]
        for r in semdedup(emb, cents, threshold=0.9, max_cluster_size=5).collect()
    }
    uncapped = {
        r["vec_id"]: r["pruned"]
        for r in semdedup(emb, cents, threshold=0.9).collect()
    }
    assert wide == uncapped == {10: False, 11: True, 12: True, 13: True, 14: True}


def test_capped_verdict_matches_brute_force_on_random_corpus(spark):
    """Property check of the capped semantics on a seeded random corpus:
    the operator's verdict must equal a pure-Python reimplementation of
    the spec — assign to nearest centroid (ties → lowest c_id), rank by
    (rounded cos_centroid, id) within cluster, bucket by cap, prune iff
    a lower-sorted same-bucket neighbour clears the threshold."""
    import random

    from gistdex_spark.operators.semdedup import semdedup

    rng = random.Random(11)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(60)
    }
    # plant duplicate groups so the threshold actually fires
    for i in range(0, 60, 7):
        vecs[i] = [x * rng.uniform(0.9, 1.1) for x in vecs[(i + 13) % 60]]
    cents = {0: vecs[0], 1: vecs[1], 2: vecs[2]}
    cap, thr = 5, 0.8

    def cos(a, b):
        return round(_cos(a, b), 6)

    assign = {
        i: min(
            cents,
            key=lambda c: (-cos(v, cents[c]), c),
        )
        for i, v in vecs.items()
    }
    expected = {}
    for c in cents:
        members = sorted(
            (i for i in vecs if assign[i] == c),
            key=lambda i: (cos(vecs[i], cents[c]), i),
        )
        buckets = [members[o : o + cap] for o in range(0, len(members), cap)]
        for bucket in buckets:
            for bi, b in enumerate(bucket):
                expected[b] = any(
                    cos(vecs[a], vecs[b]) >= thr for a in bucket[:bi]
                )
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        schema="vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    cdf = spark.createDataFrame(
        [(c, v) for c, v in cents.items()],
        schema="c_id BIGINT, c_vec ARRAY<DOUBLE>",
    )
    got = {
        r["vec_id"]: r["pruned"]
        for r in semdedup(
            emb, cdf, threshold=thr, max_cluster_size=cap
        ).collect()
    }
    assert got == expected


def test_suggest_n_clusters_scales_with_corpus():
    from gistdex_spark.operators.semdedup import suggest_n_clusters

    assert suggest_n_clusters(0) == 8
    assert suggest_n_clusters(1000) == 8          # floor for tiny corpora
    assert suggest_n_clusters(55_000) == 183      # the sf1 regime
    assert suggest_n_clusters(5_500_000) == 18_333
    # ratio is stable: 10x the vectors -> ~10x the clusters
    assert 9 <= suggest_n_clusters(5_500_000) / suggest_n_clusters(550_000) <= 11
