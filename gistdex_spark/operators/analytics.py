"""Analytics over search results and corpora (SURVEY.md §2.4 A1-A15).

Reference semantics ported exactly (they are hash-compared against a DuckDB
oracle):
- A3 `calculateSearchStats` (`search.ts:320-348`): n, avg/max/min score.
- A4 `calculateDetailedMetrics` (`score-analysis.ts:42-93`): POPULATION
  variance/stddev; percentiles are ceil-index on the ascending-sorted score
  list — scores[clamp(ceil(p/100*n)-1, 0, n-1)] — NOT interpolated, so we
  implement them with row_number, not percentile_approx.
- A5 `calculateScoreDistribution` (`score-analysis.ts:98-143`): high>=0.8 /
  medium>=0.5 / low buckets; 10 fixed histogram bins [x, x+0.1) over [0,1).
- A6 `analyzeItems` (`source-analyzer.ts:14-69`): per-source group-by.
- A8 keyword frequency (`stop-words.ts:222-301`): tokenize, drop stop words,
  minLength/minFrequency/topN ranking.

Everything is a single hash aggregation (partial+final) — one shuffle, no
driver-side loops; at 100 TB these are the textbook Spark aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gistdex_spark.functions.text import stopword_array, tokens

ROUND = 6


def search_stats(df: DataFrame, score_col: str = "score") -> DataFrame:
    """A3: one row — totalResults, averageScore, maxScore, minScore."""
    return df.agg(
        F.count(F.lit(1)).alias("total_results"),
        F.round(F.avg(score_col), ROUND).alias("avg_score"),
        F.round(F.max(score_col), ROUND).alias("max_score"),
        F.round(F.min(score_col), ROUND).alias("min_score"),
    )


def bucketed_global_rank(
    df: DataFrame,
    value_col: str,
    tiebreaks: tuple[str, ...] = (),
    rank_buckets: int = 1024,
    out_col: str = "rn",
    total_col: str = "_n",
    extra_aggs: tuple = (),
) -> DataFrame:
    """Global 1-based ``row_number() OVER (ORDER BY value_col, *tiebreaks)``
    WITHOUT a single-partition sort — the reusable form of the
    ``detailed_metrics`` ranking scheme.

    Values are range-bucketed on their domain (bucket monotone in value,
    so ties never straddle buckets), ranked locally with a
    bucket-PARTITIONED window, then shifted by per-bucket cumulative
    offsets computed over <= rank_buckets rows via a broadcast
    theta-join. With a unique (value, *tiebreaks) key the resulting rank
    is deterministic and identical to the unpartitioned window's.

    Adds ``out_col`` (the global rank) and ``total_col`` (total row
    count, broadcast scalar) to ``df``; all intermediates are dropped.
    """
    # extra_aggs: additional scalar aggregates (already aliased) that
    # ride the same one-pass aggs frame and survive into the output —
    # lets callers like detailed_metrics fold their stats into the
    # ranking's single pre-aggregation instead of scanning again.
    aggs = df.agg(
        F.count(F.lit(1)).alias(total_col),
        F.min(value_col).alias("_mn"),
        F.max(value_col).alias("_mx"),
        *extra_aggs,
    )
    span = F.col("_mx") - F.col("_mn")
    bucket = (
        F.when(
            span > 0,
            F.least(
                F.lit(rank_buckets - 1),
                F.floor((F.col(value_col) - F.col("_mn")) / span * rank_buckets),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    joined = df.crossJoin(F.broadcast(aggs)).withColumn("_bkt", bucket)
    order = [F.asc(value_col)] + [F.asc(c) for c in tiebreaks]
    w_rank = Window.partitionBy("_bkt").orderBy(*order)
    w_cnt = Window.partitionBy("_bkt")
    # distinct (not filter(lrn == 1)) keeps the exchange subtrees
    # canonical so ReuseExchange shuffles the bucketed rows exactly once
    # — same reasoning as detailed_metrics below.
    local = joined.withColumn("_lrn", F.row_number().over(w_rank)).withColumn(
        "_bcnt", F.count(F.lit(1)).over(w_cnt)
    )
    firsts = local.select("_bkt", F.col("_bcnt").alias("_c")).distinct()
    lower = firsts.select(F.col("_bkt").alias("_lb"), F.col("_c").alias("_lc"))
    offs = (
        firsts.join(F.broadcast(lower), F.col("_lb") < F.col("_bkt"), "left")
        .groupBy("_bkt")
        .agg(F.coalesce(F.sum("_lc"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offs), "_bkt")
        .withColumn(out_col, F.col("_off") + F.col("_lrn"))
        .drop("_bkt", "_lrn", "_bcnt", "_off", "_mn", "_mx")
    )


def detailed_metrics(
    df: DataFrame, score_col: str = "score", rank_buckets: int = 1024
) -> DataFrame:
    """A4: variance/stddev (population) + exact ceil-index percentiles.

    Scale shape: global ranks WITHOUT a single-partition sort, via the
    shared ``bucketed_global_rank`` scheme (range-bucketed values, local
    windows, broadcast cumulative offsets — no unpartitioned window
    anywhere in the plan). The scalar stats fold into the ranking's own
    pre-aggregation (``extra_aggs``), so the input is scanned once, and
    the distinct-based offset branch keeps the exchange subtrees
    canonical so ReuseExchange shuffles the scored rows exactly once
    (pinned by test_detailed_metrics_reuses_exchange). Equal scores may
    permute within a rank run, but the VALUE at any global rank is
    identical, which is all ceil-index extraction reads.
    """
    base = df.select(F.col(score_col).alias("s"))
    ranked = bucketed_global_rank(
        base,
        "s",
        rank_buckets=rank_buckets,
        out_col="rn",
        total_col="total_results",
        extra_aggs=(
            F.round(F.avg("s"), ROUND).alias("avg_score"),
            F.round(F.max("s"), ROUND).alias("max_score"),
            F.round(F.min("s"), ROUND).alias("min_score"),
            F.round(F.var_pop("s"), ROUND).alias("score_variance"),
            F.round(F.stddev_pop("s"), ROUND).alias("score_stddev"),
        ),
    )
    n = F.col("total_results")

    def pct(p: int):
        # ceil(p/100*n) clamped to [1, n], 1-based (reference ceil-index).
        idx = F.greatest(F.lit(1), F.least(F.ceil(F.lit(p / 100.0) * n), n))
        return idx

    return ranked.groupBy(
        "total_results", "avg_score", "max_score", "min_score",
        "score_variance", "score_stddev",
    ).agg(
        F.round(F.max(F.when(F.col("rn") == pct(25), F.col("s"))), ROUND).alias("p25"),
        F.round(F.max(F.when(F.col("rn") == pct(50), F.col("s"))), ROUND).alias("p50"),
        F.round(F.max(F.when(F.col("rn") == pct(75), F.col("s"))), ROUND).alias("p75"),
        F.round(F.max(F.when(F.col("rn") == pct(90), F.col("s"))), ROUND).alias("p90"),
    )


def score_buckets(df: DataFrame, score_col: str = "score") -> DataFrame:
    """A5 part 1: high (>=0.8) / medium (>=0.5) / low counts, one row."""
    s = F.col(score_col)
    return df.agg(
        F.count(F.when(s >= 0.8, 1)).alias("high"),
        F.count(F.when((s >= 0.5) & (s < 0.8), 1)).alias("medium"),
        F.count(F.when(s < 0.5, 1)).alias("low"),
    )


def score_histogram(df: DataFrame, score_col: str = "score") -> DataFrame:
    """A5 part 2: the reference's 10 fixed bins [x, x+0.1) over [0, 1).

    Emits all 10 bins (zero-filled) like the reference, as (bin, range, count).
    """
    s = F.col(score_col)
    spark = df.sparkSession
    bins = spark.range(10).select(
        F.col("id").cast("int").alias("bin"),
        F.format_string(
            "%.1f-%.1f", F.col("id") / 10.0, (F.col("id") + 1) / 10.0
        ).alias("bin_range"),
    )
    counted = (
        df.select(F.floor(s * 10).cast("int").alias("bin"))
        .filter((F.col("bin") >= 0) & (F.col("bin") <= 9))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        bins.join(counted, "bin", "left")
        .select(
            "bin",
            "bin_range",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("count_in_bin"),
        )
    )


def group_by_source(df: DataFrame) -> DataFrame:
    """A6: per-source census over the documents corpus."""
    return df.groupBy("source").agg(
        F.count(F.lit(1)).alias("chunk_count"),
        F.round(F.avg("n_chars"), ROUND).alias("avg_chars"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc_id"),
        F.countDistinct("lang").alias("lang_count"),
    )


def stats_by_key(df: DataFrame, key: str) -> DataFrame:
    """A2 `getStats`: total count per key in ONE pass (the reference loops
    one COUNT query per sourceType; the group-by is strictly better)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("doc_count"))


def topic_clusters(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    top_topics: int = 5,
    min_length: int = 3,
) -> DataFrame:
    """A9 (`metadata-generator.ts:208-242`): top-N frequent non-stop words
    as topics; per topic the member docs and confidence = coverage ratio.

    Two passes over the exploded words: frequency ranking, then membership
    agg — both hash aggregations, the explode never leaves the executor.
    """
    from gistdex_spark.functions.text import STOP_WORDS

    words = (
        df.select(F.col(id_col), F.explode(tokens(content_col)).alias("word"))
        .filter(F.length("word") >= min_length)
        .filter(~F.col("word").isin(sorted(STOP_WORDS)))
        .distinct()
    )
    topics = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("word"))
        .limit(top_topics)
    )
    total = df.count()
    return (
        words.join(F.broadcast(topics), "word")
        .groupBy("word", "n_members")
        .agg(F.array_sort(F.collect_set(id_col)).alias("member_docs"))
        .select(
            F.col("word").alias("topic"),
            "n_members",
            F.round(F.col("n_members") / F.lit(float(total)), ROUND).alias("confidence"),
            "member_docs",
        )
    )


def coherence_diversity(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id",
    min_length: int = 3,
) -> DataFrame:
    """A10 (`metadata-generator.ts:160-203`): one-row corpus metrics.

    coherence = |words in >1 doc| / |distinct words| (shared-vocab ratio);
    diversity = 1 - Simpson index over word frequencies (sum p^2).
    """
    words = (
        df.select(F.col(id_col), F.explode(tokens(content_col)).alias("word"))
        .filter(F.length("word") >= min_length)
    )
    per_word = words.groupBy("word").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("freq"),
    )
    return per_word.agg(
        F.round(
            F.count(F.when(F.col("n_docs") > 1, 1)) / F.count(F.lit(1)).cast("double"),
            ROUND,
        ).alias("coherence"),
        F.round(
            1.0
            - F.sum(F.col("freq") * F.col("freq"))
            / (F.sum("freq") * F.sum("freq")).cast("double"),
            ROUND,
        ).alias("diversity"),
    )


def redundancy(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """A11 (`agent-query-tool.ts:257-271`): mean pairwise Jaccard of result
    word-sets — one row. The reference runs this on k<=15 search results;
    the pair join here generalizes to any small result set (for corpora use
    the dedup family instead)."""
    sets = df.select(
        F.col(id_col).alias("id"), F.array_distinct(tokens(content_col)).alias("ws")
    )
    l = sets.select(F.col("id").alias("id_a"), F.col("ws").alias("ws_a"))
    r = sets.select(F.col("id").alias("id_b"), F.col("ws").alias("ws_b"))
    pairs = l.join(r, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
    union = F.size(F.array_union("ws_a", "ws_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return pairs.agg(
        F.coalesce(F.round(F.avg(jac), ROUND), F.lit(0.0)).alias("redundancy"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


def keyword_coverage(
    df: DataFrame, keywords: list[str], content_col: str = "text",
) -> DataFrame:
    """A12 (`metadata-generator.ts:123-155`): per query-keyword, how many
    docs contain it (case-insensitive substring) + found flag."""
    spark = df.sparkSession
    kw = spark.createDataFrame([(k,) for k in keywords], schema="keyword STRING")
    low = F.lower(F.col(content_col))
    hits = (
        df.crossJoin(F.broadcast(kw))
        .withColumn("hit", F.when(F.instr(low, F.lower(F.col("keyword"))) > 0, 1).otherwise(0))
        .groupBy("keyword")
        .agg(F.sum("hit").cast("bigint").alias("n_docs_containing"))
        .withColumn("found", (F.col("n_docs_containing") > 0).cast("boolean"))
    )
    return hits


_LANG_PATTERNS = {
    "python": r"\bdef\s+\w+\s*\(|\bimport\s+\w+",
    "javascript": r"\bfunction\s+\w+\s*\(|\bconst\s+\w+\s*=",
    "sql": r"\bSELECT\b.*\bFROM\b|\bGROUP BY\b",
    "java": r"\bpublic\s+(static\s+)?\w+\s+\w+\s*\(",
}


def code_language_census(df: DataFrame, content_col: str = "text") -> DataFrame:
    """A14 (`metadata-generator.ts:504-528`): per-language presence count
    via regex — one pass, one agg row per language."""
    aggs = [
        F.count(F.when(F.col(content_col).rlike(rx), 1)).alias(lang)
        for lang, rx in _LANG_PATTERNS.items()
    ]
    wide = df.agg(*aggs)
    # unpivot to (language, n_docs) — stack is a narrow projection
    n = len(_LANG_PATTERNS)
    stack_args = ", ".join(f"'{lang}', {lang}" for lang in _LANG_PATTERNS)
    return wide.selectExpr(
        f"stack({n}, {stack_args}) as (language, n_docs)"
    )


def keyword_frequency(
    df: DataFrame,
    content_col: str = "text",
    min_length: int = 3,
    min_frequency: int = 2,
    top_n: int = 20,
) -> DataFrame:
    """A8: tokenize → drop stop words → frequency ranking.

    explode + hash-agg; the stop-word list rides along as a literal array
    (broadcast by value). Deterministic order: count desc, word asc.
    """
    from gistdex_spark.functions.text import STOP_WORDS

    words = (
        df.select(F.explode(tokens(content_col)).alias("word"))
        .filter(F.length("word") >= min_length)
        .filter(~F.col("word").isin(sorted(STOP_WORDS)))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_frequency)
    )
    return words.orderBy(F.desc("cnt"), F.asc("word")).limit(top_n)


def profile_table(df):
    """One row per column: null count, exact distinct count, min/max (as
    strings, so heterogeneous column types stack into one frame).

    Single aggregate pass; the multi-column DISTINCT uses Catalyst's
    expand (one shuffle total). At very wide tables swap countDistinct
    for approx_count_distinct — the HLL sketch keeps the pass map-side.
    """
    from pyspark.sql import functions as F

    aggs = []
    for c in df.columns:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}"),
            F.countDistinct(F.col(c)).alias(f"__d_{c}"),
            F.min(s).alias(f"__min_{c}"),
            F.max(s).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n_nulls"),
                F.col(f"__d_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_s"),
                F.col(f"__max_{c}").alias("max_s"),
            )
            for c in df.columns
        ]
    )
    return row.select(F.explode(stacked).alias("p")).select("p.*")
