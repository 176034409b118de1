"""Engine-portable Bloom-filter semi-join pruning.

The classic 100 TB join trick: before shuffling a huge fact side into an
equi-join, drop the rows that cannot possibly match by probing a bloom
filter of the (much smaller) key side — Spark's own runtime filter
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) does exactly this,
but its `bloom_filter_agg` expression is internal-only, so this module
builds the same structure from public primitives:

- build: each key sets ``n_hashes`` bits (md5-derived positions — the
  repo-standard engine-portable hash) in an ``m_bits`` array, aggregated
  as (word -> 32-bit mask) via bit_or and shipped as ONE broadcast row
  holding a MAP<BIGINT,BIGINT> (absent word == all-zero mask).
- probe: a narrow map-side expression ANDing the bit tests — no shuffle,
  no Python; the fact scan streams past the kilobyte-scale map.

No false negatives by construction, so a bloom-pruned join returns the
IDENTICAL result to the plain join — which is how the oracle checks it:
the query's DuckDB oracle is the plain join, and any dropped match would
break value parity. False positives only cost wasted probe rows; the
pruning effectiveness is asserted separately in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_pos(key: Column, seed: int, m_bits: int) -> Column:
    """60-bit md5 of 'seed:key' mod m_bits — same value in DuckDB via
    ('0x' || substr(md5(...), 1, 15))::BIGINT % m_bits."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(m_bits)


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 131072,
    n_hashes: int = 5,
) -> DataFrame:
    """One-row DataFrame (column ``bf``: MAP<BIGINT,BIGINT>) — the bloom
    bit array in 32-bit words. Build cost: one narrow explode (n_hashes
    rows per key) + one map-side-combined bit_or agg whose output is at
    most m_bits/32 rows, collapsed into a single broadcastable map."""
    assert m_bits % 32 == 0
    k = F.col(key_col)
    pos = keys.select(
        F.explode(
            F.array(*[_hash_pos(k, s, m_bits) for s in range(n_hashes)])
        ).alias("pos")
    )
    # 32-bit words: every mask value (2^0..2^31) is exactly representable
    # as both a double and a positive BIGINT, so pow-based bit math is
    # portable across engines with no sign-bit edge at 63
    masks = pos.select(
        ((F.col("pos") - F.col("pos") % 32) / 32).cast("long").alias("word"),
        F.pow(F.lit(2.0), (F.col("pos") % 32).cast("double"))
        .cast("long")
        .alias("mask"),
    )
    words = masks.groupBy("word").agg(F.expr("bit_or(mask)").alias("mask"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("bf")
    )


def might_contain(
    bf: Column, key: Column, m_bits: int = 131072, n_hashes: int = 5
) -> Column:
    """True unless some hash position's bit is unset — the map-side probe
    predicate. A missing map entry is an all-zero word."""
    test = F.lit(True)
    for s in range(n_hashes):
        pos = _hash_pos(key, s, m_bits)
        word = ((pos - pos % 32) / 32).cast("long")
        word_mask = F.coalesce(
            F.element_at(bf, word), F.lit(0).cast("long")
        )
        bit = F.pow(F.lit(2.0), (pos % 32).cast("double")).cast("long")
        test = test & (word_mask.bitwiseAND(bit) != 0)
    return test


def bloom_prefilter(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    key_col: str,
    m_bits: int = 131072,
    n_hashes: int = 5,
) -> DataFrame:
    """fact rows surviving the bloom probe of ``keys`` — a superset of the
    semi-join (false positives possible, false negatives impossible)."""
    bloom = build_bloom(keys, key_col, m_bits, n_hashes)
    return fact.crossJoin(F.broadcast(bloom)).filter(
        might_contain(F.col("bf"), F.col(fact_key), m_bits, n_hashes)
    ).drop("bf")
