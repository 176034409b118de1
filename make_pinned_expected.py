#!/usr/bin/env python
"""Freeze expected frames for deterministic-but-not-SQL-expressible
registry queries (fixtures/pinned_expected_{sfname}.json).

The r12 pattern (make_ann_expected.py for the trained-ANN trio),
generalized: any query whose semantics are bit-deterministic but have
no tractable DuckDB replay — gets a frozen canon frame per SF, and
make_parity compares live frames against it at full value level
(check: values_pinned).

Round 14: the BPE-token family gained REAL DuckDB oracles (the merge
loop's output factors through the frozen word -> n_tokens dictionary,
fixtures/bpe_word_tokens.json via make_bpe_dict.py — see
queries._bpe_oracle_base), so make_parity and the driver now verify
them through the ORACLES path; these pins remain as a SECONDARY
bit-determinism gate (tests/test_bpe.py::test_pinned_frames_roundtrip).
Regenerating is an intentional, diff-visible act; do it ONLY when the
tokenizer fixture or query semantics change:

  python make_pinned_expected.py /root/testdata/sf0.01
  python make_pinned_expected.py /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PINNED_QUERIES = [
    "token_count_bpe",
    "sequence_packing_stats_bpe",
    "shard_manifest_bpe",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    from gistdex_spark.parity import to_pinned
    from gistdex_spark.queries import REGISTRY
    from gistdex_spark.session import get_spark

    spark = get_spark(
        "make-pinned-expected", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8")
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in PINNED_QUERIES:
        pdf = REGISTRY[name](spark, sf_dir).toPandas()
        out[name] = to_pinned(pdf)
        print(f"{name}: {len(pdf)} rows pinned", file=sys.stderr)
    os.makedirs("fixtures", exist_ok=True)
    path = f"fixtures/pinned_expected_{sf_name}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
