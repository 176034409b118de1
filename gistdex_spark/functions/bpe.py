"""Deterministic byte-pair-encoding tokenizer over a frozen merges
table — tokenizer-aware token accounting for the pretraining-budget
operators.

The reference estimates tokens by whitespace (`src/core/search/
utils.ts` token estimation; our `operators/textstats.token_count`
mirrors it), and every token-denominated operator in the pipeline
family (`sequence_packing_stats`, `unigram_logprob`, shard budgeting)
inherited that unit. A real pretraining budget counts TOKENIZER
tokens: packing straddle rates, shard token spans, and fertility all
shift when "token" means a BPE merge-table unit instead of a
whitespace word. This module supplies that unit without any external
model dependency:

- :func:`train_bpe` is textbook Sennrich-style BPE (Sennrich, Haddow &
  Birch 2016, "Neural Machine Translation of Rare Words with Subword
  Units" — the public algorithm): count symbol pairs over a word
  frequency table, repeatedly merge the most frequent pair. Every tie
  breaks lexicographically, so training is bit-deterministic for a
  given word-count table — which makes the merges table FREEZABLE as a
  fixture (``fixtures/bpe_merges.json``, trained once on the sf0.001
  documents corpus by ``make_bpe_merges.py``) and the downstream
  queries pinnable at value level.
- :func:`apply_bpe` / :func:`token_count` are the driver-side
  reference implementation (greedy lowest-rank-pair merging, the
  standard BPE.apply loop).
- :func:`bpe_token_count_udf` is the distributed form: an
  Arrow-batched pandas UDF (never row-at-a-time Python) that counts
  BPE tokens per document. The merge loop is pure-Python per DISTINCT
  word — a per-batch word memo makes the hot path a dict lookup, since
  natural-language batches repeat words heavily — and the ranks table
  is built once per executor from the broadcast merges list.

Pre-tokenization deliberately reuses ``functions.text.tokens``'s word
stream (lowercase, split on the multilingual separator regex): BPE
token counts are then directly comparable to the whitespace counts the
rest of the registry reports (fertility = bpe_tokens / ws_tokens), and
the packing-query pair (`sequence_packing_stats` vs `_bpe`) differs in
exactly one thing — the unit.

Scale: the UDF is map-only (no shuffle), the merges table is a few KB
shipped in the serialized closure, and the word memo bounds the merge
loop to distinct-words-per-batch. At 100 TB this is the same shape as
any tokenizer-in-a-UDF pipeline: embarrassingly parallel scan work.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

from gistdex_spark.functions.text import TOKEN_SPLIT_RE

# End-of-word sentinel: lets merges distinguish word-final symbols
# (classic BPE; "st</w>" in "lowest" never merges with "st" mid-word).
EOW = "</w>"

_SPLIT = re.compile(TOKEN_SPLIT_RE)


def pretokenize(text: str | None) -> list[str]:
    """The word stream BPE runs over — identical to
    functions.text.tokens: lowercase, split on the multilingual
    separator regex, drop empties."""
    if not text:
        return []
    return [w for w in _SPLIT.split(text.lower()) if w]


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def train_bpe(
    texts: Iterable[str], n_merges: int = 256
) -> list[list[str]]:
    """Learn ``n_merges`` merge rules from a corpus. Deterministic:
    pair selection is (max count, then lexicographically smallest
    pair), so the same corpus always yields the same table. Driver-side
    by design — training is a fixture-generation step, not a query; the
    word-count table it needs can be collected from a distributed
    ``groupBy(word).count()`` when the corpus is large.
    """
    word_counts: Counter[str] = Counter()
    for t in texts:
        word_counts.update(pretokenize(t))
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(w): c for w, c in word_counts.items() if w
    }
    merges: list[list[str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < 2:
            break  # nothing left that actually compresses
        best = min(p for p, c in pairs.items() if c == best_n)
        merges.append(list(best))
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _ranks(merges: list[list[str]]) -> dict[tuple[str, str], int]:
    return {(a, b): i for i, (a, b) in enumerate(merges)}


def apply_bpe(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Greedy standard BPE apply: repeatedly merge the present pair
    with the LOWEST rank (earliest-learned) until no learned pair
    remains."""
    if not word:
        return []
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def token_count(text: str | None, ranks) -> int:
    """Driver-side reference: total BPE tokens of a document."""
    if isinstance(ranks, list):
        ranks = _ranks(ranks)
    memo: dict[str, int] = {}
    n = 0
    for w in pretokenize(text):
        c = memo.get(w)
        if c is None:
            c = len(apply_bpe(w, ranks))
            memo[w] = c
        n += c
    return n


def tokenize(text: str | None, ranks) -> list[str]:
    """Driver-side reference: the document's full BPE token sequence
    (concatenation of each word's merge-loop output, in word order) —
    the per-TOKEN analog of :func:`token_count`, for operators that
    need the subword stream itself (unigram log-prob, vocab coverage,
    OOV) rather than per-document totals."""
    if isinstance(ranks, list):
        ranks = _ranks(ranks)
    memo: dict[str, list[str]] = {}
    out: list[str] = []
    for w in pretokenize(text):
        toks = memo.get(w)
        if toks is None:
            toks = apply_bpe(w, ranks)
            memo[w] = toks
        out.extend(toks)
    return out


def bpe_tokens_udf(merges: list[list[str]]):
    """Arrow-batched pandas UDF: the BPE token ARRAY per document —
    same closure/memo shape as :func:`bpe_token_count_udf`, returning
    the sequence instead of its length. Map-only; the downstream
    explode is the same shape as the whitespace-token explodes the
    registry already carries. Iterator form (guide §4.5): the ranks
    table and the distinct-word memo are built once per TASK and
    amortized over every Arrow batch in the partition — the Series
    form re-derived both every ``maxRecordsPerBatch`` rows, re-running
    the merge loop for words already seen in the previous batch."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    frozen = [tuple(m) for m in merges]

    @pandas_udf("array<string>")
    def _toks(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ranks = {p: i for i, p in enumerate(frozen)}
        memo: dict[str, list[str]] = {}

        def one(t) -> list[str]:
            out: list[str] = []
            for w in pretokenize(t):
                toks = memo.get(w)
                if toks is None:
                    toks = apply_bpe(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        for texts in batches:
            yield texts.map(one)

    return _toks


def bpe_tokens(col: Column | str, merges: list[list[str]]) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return bpe_tokens_udf(merges)(col)


def bpe_token_count_udf(merges: list[list[str]]):
    """Arrow-batched pandas UDF: BPE token count per document. Iterator
    form (guide §4.5): the ranks table is built once per TASK from the
    closure's merges list, and the distinct-word memo spans every batch
    in the partition — one merge-loop run per distinct word per task,
    not per batch."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    frozen = [tuple(m) for m in merges]

    @pandas_udf("bigint")
    def _count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ranks = {p: i for i, p in enumerate(frozen)}
        memo: dict[str, int] = {}

        def one(t) -> int:
            n = 0
            for w in pretokenize(t):
                c = memo.get(w)
                if c is None:
                    c = len(apply_bpe(w, ranks))
                    memo[w] = c
                n += c
            return n

        for texts in batches:
            yield texts.map(one)

    return _count


def bpe_token_count(col: Column | str, merges: list[list[str]]) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return bpe_token_count_udf(merges)(col)


def load_merges(path: str) -> list[list[str]]:
    import json  # noqa: PLC0415

    with open(path) as f:
        return json.load(f)["merges"]
