#!/usr/bin/env python
"""Freeze the BPE merges fixture (fixtures/bpe_merges.json).

Training (functions/bpe.train_bpe) is bit-deterministic for a given
corpus — pair selection ties break lexicographically — so the merges
table is a freezable fixture exactly like the ANN expected frames: the
BPE-denominated registry queries (`token_count_bpe`,
`sequence_packing_stats_bpe`) are pinned at value level against frames
computed with THIS table, and regenerating it is an intentional,
diff-visible act.

Trained on the sf0.001 documents corpus (small enough to count words
driver-side in milliseconds; the resulting subword table is applied at
every SF — a tokenizer is trained once and reused, which is the point).

Regenerate ONLY on an intentional tokenizer change:
  python make_bpe_merges.py [n_merges]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = "/root/testdata/sf0.001/documents.parquet"
# The synthetic corpus has a ~31-word vocabulary; past ~90 merges the
# table saturates (every word one token, fertility 1.0 — a vacuous
# tokenizer). 64 merges leaves genuine subword structure: measured
# fertility ~1.94 at sf0.01, in the realistic range for a small table.
N_MERGES = 64


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_MERGES
    import duckdb

    from gistdex_spark.functions.bpe import train_bpe

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{CORPUS}' ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train_bpe(texts, n_merges=n)
    os.makedirs("fixtures", exist_ok=True)
    out = {
        "algorithm": "sennrich-bpe",
        "corpus": CORPUS,
        "n_merges_requested": n,
        "n_merges": len(merges),
        "merges": merges,
    }
    with open("fixtures/bpe_merges.json", "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"wrote fixtures/bpe_merges.json ({len(merges)} merges from "
        f"{len(texts)} docs)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
