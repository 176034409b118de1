"""Freeze the expected top-10 frames of the three trained-ANN registry
queries (ann_pq_search, ann_ivf_trained, ann_ivfpq_search) per scale
factor. Training is seeded and deterministic end to end (seeded
distributed sample -> driver-side seeded k-means++), verified by
byte-identical cross-process runs, so the result frames are pinnable the
same way the plan gallery pins physical plans. make_parity.py compares
the live frames against these pins at VALUE level (6-dp canon), keeping
the recall-vs-exact-kNN floor as a secondary gate.

Regenerate ONLY on an intentional training change:
  python make_ann_expected.py /root/testdata/sf0.01
  python make_ann_expected.py /root/testdata/sf0.1
Writes fixtures/ann_expected_{sfname}.json. Uses the parity harness's
session shape (SPARK_GRAFT_CPUS, default 8) — the distributed sample is
seed-stable for a fixed partition layout.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PINNED_ANN = ["ann_pq_search", "ann_ivf_trained", "ann_ivfpq_search"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    from gistdex_spark.parity import to_pinned
    from gistdex_spark.queries import REGISTRY
    from gistdex_spark.session import get_spark

    spark = get_spark(
        "make-ann-expected", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8")
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in PINNED_ANN:
        pdf = REGISTRY[name](spark, sf_dir).toPandas()
        out[name] = to_pinned(pdf)
        print(f"{name}: {len(pdf)} rows pinned", file=sys.stderr)
    os.makedirs("fixtures", exist_ok=True)
    path = f"fixtures/ann_expected_{sf_name}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
