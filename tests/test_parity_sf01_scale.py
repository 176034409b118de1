"""Scale-up parity: a curated slice of the registry re-checked against
DuckDB at sf0.1 (10x the full-suite SF). Catches what sf0.01 cannot:
partitioning-dependent float accumulation, threshold flips on bigger
domains, and overflow — the "results must not depend on cluster size"
claim of SCALE.md, tested rather than asserted.

Curated rather than exhaustive (the full 139-query run at sf0.1 belongs
to make_parity, not the per-commit suite): one representative per family
whose aggregation shape could plausibly drift with data size.
"""

from __future__ import annotations

import duckdb
import pytest

from gistdex_spark.parity import compare
from gistdex_spark.queries import ORACLES, REGISTRY

SF_DIR = "/root/testdata/sf0.1"

SAMPLE = [
    "q1_pricing_summary",        # double sums over 600k rows
    "knn_topk",                  # rank boundary on rounded cosine
    "dedup_survivors",           # iterative CC end-to-end
    "semdedup_prune",            # salted pair join + cluster assignment
    "dsir_importance_weights",   # log-ratio double sums per doc
    "corpus_curation_pipeline",  # full composition
    "event_transitions",         # window + normalized doubles
    "cumulative_active_users",   # running sum
    "user_value_range_frame",    # RANGE frame over doubles
    "fuzzy_name_pairs",          # symspell candidates vs naive oracle
    # round-7 additions whose shapes could drift with data size
    "dedup_exact_substring_removal",  # cursor fold over bigger cut lists
    "semdedup_adaptive_prune",        # count-derived C diverges at sf0.1
    "source_quality_drift",           # integer micro-unit means per source
    "fertility_char_budget",          # DECIMAL/HUGEINT scaled DIV
    # round-9 additions
    "dedup_variable_substring_spans",    # diagonal runs: 100x the pairs
    "dedup_variable_substring_within",   # empty-result agreement at scale
    "dedup_variable_substring_removal",  # interval fold over real cut lists
    "corpus_curation_semantic",          # gate-derived adaptive C diverges
    # round-10 additions
    "dedup_variable_substring_within_aug",  # NON-EMPTY within-doc spans
    "chunk_markdown_census",             # section boundaries on 10x docs
    "chunk_fixed",                       # fixed-window boundaries at scale
    "ann_lsh_multitable",                # union-of-probes + rerank ties
]


@pytest.fixture(scope="module")
def duck_sf01():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SAMPLE)
def test_scale_parity(name, spark, duck_sf01):
    sdf = REGISTRY[name](spark, SF_DIR).toPandas()
    ddf = duck_sf01.execute(ORACLES[name]).fetchdf()
    r = compare(sdf, ddf)
    assert r["rows_match"], (name, r["spark_rows"], r["oracle_rows"])
    assert r["schema_match"], name
    assert r["values_match"], (name, r.get("first_mismatches", [])[:3])
