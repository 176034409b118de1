#!/usr/bin/env python
"""Freeze the per-distinct-word BPE token-count dictionary
(fixtures/bpe_word_tokens.json) — the unit table that lets the BPE
registry queries carry REAL DuckDB oracles.

The BPE merge loop has no SQL form, but its OUTPUT on a fixed corpus
factors through a finite word -> n_tokens mapping: tokenization is
per-word and token counts are additive over a document's word stream
(functions/bpe.py `token_count`). Freezing ONLY that unit mapping —
computed by the driver-side reference `apply_bpe` over the union of
distinct words across every test SF — lets oracle SQL tokenize with
the SAME split regex (`functions.text.sql_tokens`), join words to the
dictionary, and replay all fertility / packing / shard arithmetic
independently in DuckDB. The aggregation pipeline is then verified by
an independent engine; only the per-word unit is pinned (r13 verdict
item 1 / ADVICE on make_pinned_expected's circularity).

The oracles join with an INNER join on word: a corpus word missing
from the dictionary silently drops its tokens from the DuckDB side and
the value compare fails LOUDLY — out-of-vocabulary drift cannot pass.

Regenerate ONLY when fixtures/bpe_merges.json or the test corpora
change:

  python make_bpe_dict.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> int:
    import duckdb

    from gistdex_spark.functions.bpe import _ranks, apply_bpe, load_merges
    from gistdex_spark.functions.text import sql_tokens

    merges_path = "fixtures/bpe_merges.json"
    ranks = _ranks(load_merges(merges_path))
    with open(merges_path, "rb") as f:
        merges_md5 = hashlib.md5(f.read()).hexdigest()

    con = duckdb.connect()
    words: set[str] = set()
    for sf in SF_DIRS:
        rows = con.execute(
            f"SELECT DISTINCT unnest({sql_tokens('text')}) AS w "
            f"FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall()
        words.update(r[0] for r in rows if r[0])
        print(f"{sf}: vocab union now {len(words)}", file=sys.stderr)

    pieces = {w: apply_bpe(w, ranks) for w in sorted(words)}
    counts = {w: len(p) for w, p in pieces.items()}
    # word_pieces (the token LISTS) lets oracle SQL replay per-TOKEN
    # operators too (unigram log-prob, vocab coverage, OOV): unnest the
    # joined piece list and the full BPE token stream exists in DuckDB.
    out = {
        "merges_md5": merges_md5,
        "word_tokens": counts,
        "word_pieces": pieces,
    }
    path = "fixtures/bpe_word_tokens.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(counts)} words", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
