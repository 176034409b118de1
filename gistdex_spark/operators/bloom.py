"""Engine-portable Bloom-filter semi-join pruning.

The classic 100 TB join trick: before shuffling a huge fact side into an
equi-join, drop the rows that cannot possibly match by probing a bloom
filter of the (much smaller) key side — Spark's own runtime filter
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) does exactly this,
but its `bloom_filter_agg` expression is internal-only, so this module
builds the same structure from public primitives:

- build: each key sets ``n_hashes`` positions (seeded xxhash64 — the
  native long hash, no string digest on the hot probe path) in a
  ``m_bits`` universe. The
  DISTINCT occupied positions are collected (bounded by the m_bits
  PARAMETER, never the key count — positions saturate) and laid out as a
  dense BOOLEAN array in one broadcast row. Spark's own runtime filter
  likewise materializes the bloom at the driver before re-broadcasting;
  the collect here is the same bounded step. Dense-array layout matters:
  Spark's ``element_at`` on a MAP is a LINEAR scan (measured 110s at
  sf0.1 with a 131k-entry map), on an ARRAY it is O(1) indexing.
- probe: ONE xxhash64 + ONE O(1) array index per hash seed, ANDed — a narrow
  map-side expression, no shuffle, no Python; the fact scan streams past
  the ~m_bits/8-byte broadcast row.

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
    """xxhash64(seed, key) mod m_bits (r14-opt). The original md5-hex →
    conv(…,16,10) chain cost a string digest + base conversion per seed
    per probed row — on the 100 TB fact side that is 5 string md5s per
    row for a predicate whose only contract is "deterministic hash
    family with no false negatives". xxhash64 is a native codegen'd
    long hash (the same primitive Spark's internal runtime bloom filter
    hashes with), and the hash CHOICE is invisible to every caller: the
    query oracle is the plain join, and false-positive sets only shift
    which non-matching rows pay the real join. pmod because xxhash64 is
    signed."""
    return F.pmod(F.xxhash64(F.lit(seed), key), F.lit(m_bits))


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 131072,
    n_hashes: int = 5,
) -> DataFrame:
    """One-row DataFrame (column ``bf``: ARRAY<BOOLEAN> of length m_bits).

    Distributed part: narrow explode (n_hashes rows per key) + map-side-
    combined distinct — its OUTPUT is at most m_bits rows no matter how
    many keys feed it, so the driver collect is bounded by the filter
    parameter, not the data (the same driver materialization Spark's
    runtime bloom filter performs). The dense layout buys O(1) probes.
    """
    k = F.col(key_col)
    pos_rows = (
        keys.select(
            F.explode(
                F.array(*[_hash_pos(k, s, m_bits) for s in range(n_hashes)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    bits = [False] * m_bits
    for r in pos_rows:
        bits[r["pos"]] = True
    spark = keys.sparkSession
    return spark.createDataFrame([(bits,)], schema="bf ARRAY<BOOLEAN>")


def might_contain(
    bf: Column, key: Column, m_bits: int = 131072, n_hashes: int = 5
) -> Column:
    """True unless some hash position is unoccupied — the map-side probe
    predicate: exactly one xxhash64 and one O(1) array index per seed."""
    test = F.lit(True)
    for s in range(n_hashes):
        idx = (_hash_pos(key, s, m_bits) + F.lit(1)).cast("int")
        test = test & F.coalesce(F.element_at(bf, idx), F.lit(False))
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
