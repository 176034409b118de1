"""Text-analysis pipeline operators for LLM training-data prep.

Beyond the reference surface (sanctioned by BASELINE.json north star):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure Catalyst expressions — no Python in the hot path,
so a 100 TB documents scan stays in whole-stage codegen with the text column
as the only wide column read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gistdex_spark.functions.text import STOP_WORDS_EN, tokens

ROUND = 6

# Word-ish pieces: letter runs, digit runs, single other non-space chars —
# a BPE-ish pre-tokenization regex (same string used in the DuckDB oracle).
BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _en_stop_hits(content=None):
    content = F.col("text") if content is None else content
    toks = tokens(content)
    stop = F.lit(sorted(STOP_WORDS_EN))
    return F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))


def lang_id(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Heuristic language ID: ASCII-alpha ratio + EN stop-word hits.

    ascii_ratio > 0.9 and >=1 EN stop word -> 'en'; ascii_ratio > 0.9 ->
    'latin'; else 'other'. (n-gram profile models don't fit in a SQL oracle;
    this is the deterministic heuristic variant.)
    """
    c = F.col(content_col)
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    n_nonspace = F.length(F.regexp_replace(c, "\\s", ""))
    ratio = F.when(n_nonspace > 0, n_alpha.cast("double") / n_nonspace).otherwise(F.lit(0.0))
    pred = (
        F.when((ratio > 0.9) & (_en_stop_hits(c) >= 1), F.lit("en"))
        .when(ratio > 0.9, F.lit("latin"))
        .otherwise(F.lit("other"))
    )
    return df.select(
        "doc_id",
        F.round(ratio, ROUND).alias("alpha_ratio"),
        pred.alias("lang_pred"),
    )


def _quality_parts(c) -> tuple[F.Column, F.Column, F.Column, F.Column]:
    """(n_tokens, stop_ratio, alpha_ratio, raw quality) column expressions
    — the shared formula behind quality_score and the per-source drift
    audit. quality = 0.3*min(n_tokens/100, 1) + 0.4*stop_ratio +
    0.3*alpha_ratio; all plain arithmetic so the oracle reproduces it
    bit-for-bit."""
    toks = tokens(c)
    n_tokens = F.size(toks)
    stop_ratio = F.when(
        n_tokens > 0, _en_stop_hits(c).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    n_nonspace = F.length(F.regexp_replace(c, "\\s", ""))
    alpha_ratio = F.when(n_nonspace > 0, n_alpha.cast("double") / n_nonspace).otherwise(
        F.lit(0.0)
    )
    quality = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.3
        + stop_ratio * 0.4
        + alpha_ratio * 0.3
    )
    return n_tokens, stop_ratio, alpha_ratio, quality


def quality_micro(c) -> F.Column:
    """floor(raw quality * 1e6) as BIGINT: the integer form that sums
    order-independently across partitions (float means are partition-
    order-exposed; integer micro-unit sums are exact)."""
    return F.floor(_quality_parts(c)[3] * F.lit(1_000_000.0)).cast("bigint")


def quality_score(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Length/stopword/alpha-ratio quality heuristic (Gopher-rules flavor);
    see :func:`_quality_parts` for the formula."""
    n_tokens, stop_ratio, alpha_ratio, quality = _quality_parts(
        F.col(content_col)
    )
    return df.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(stop_ratio, ROUND).alias("stop_ratio"),
        F.round(alpha_ratio, ROUND).alias("alpha_ratio"),
        F.round(quality, ROUND).alias("quality"),
    )


def token_count(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (X24 analogue)."""
    c = F.col(content_col)
    return df.select(
        "doc_id",
        F.size(tokens(c)).cast("bigint").alias("ws_tokens"),
        F.regexp_count(c, F.lit(BPE_ISH_RE)).cast("bigint").alias("bpe_ish_tokens"),
        F.ceil(F.length(c) / 4.0).cast("bigint").alias("est_llm_tokens"),
    )


def fingerprint(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of normalized text.

    Normalization: lowercase, collapse whitespace runs to single spaces,
    trim. The fingerprint is the dedup key for exact dedup.
    """
    c = F.col(content_col)
    norm = F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))
    return df.select("doc_id", F.md5(norm).alias("fp"))


def tokenizer_fertility(
    df: DataFrame, lang_col: str = "lang", content_col: str = "text"
) -> DataFrame:
    """Per-language tokenizer-fertility audit: how many characters one
    token "buys" in each language, and how many tokens the tokenizer
    spends per word — the curation signal that tells a multilingual
    mixture (unimax_allocation, token_budget_fill) when a byte budget
    and a token budget diverge by language (e.g. CJK text at ~1 char
    per whitespace token inflates fertility; agglutinative scripts
    deflate chars/token).

    Columns per language: doc/char/token totals plus three 6-dp ratios —
    ``chars_per_bpe_token`` (compression), ``bpe_per_ws_fertility``
    (subword fertility: BPE-ish tokens per whitespace word, the standard
    tokenizer-fertility metric), ``bpe_tokens_per_doc`` (context-window
    sizing). All ratio math is INTEGER (DECIMAL(38,0) scaled multiply,
    integer DIV, floor semantics): engine-identical with no float-fold
    or round-tie exposure, and the scaled multiply cannot wrap at
    100 TB per-language char counts (the unimax_allocation convention).

    Shape: ONE corpus scan projecting (lang, three per-doc counters),
    ONE map-side-combined groupBy(lang) exchange, then pure projection
    — the per-language frame is bounded by |languages|.
    """
    c = F.col(content_col)
    per_lang = (
        df.select(
            F.col(lang_col),
            F.length(c).alias("__ch"),
            F.size(tokens(c)).alias("__ws"),
            F.regexp_count(c, F.lit(BPE_ISH_RE)).alias("__bpe"),
        )
        .groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__ch").cast("bigint").alias("chars_total"),
            F.sum("__ws").cast("bigint").alias("ws_tokens_total"),
            F.sum("__bpe").cast("bigint").alias("bpe_tokens_total"),
        )
    )

    def ratio6(num: str, den: str) -> F.Column:
        return F.when(F.col(den) <= 0, F.lit(0.0)).otherwise(
            F.expr(
                f"CAST(CAST({num} AS DECIMAL(38,0)) * 1000000 DIV {den}"
                " AS DOUBLE) / 1000000.0"
            )
        )

    return per_lang.select(
        lang_col,
        "n_docs",
        "chars_total",
        "ws_tokens_total",
        "bpe_tokens_total",
        ratio6("chars_total", "bpe_tokens_total").alias("chars_per_bpe_token"),
        ratio6("bpe_tokens_total", "ws_tokens_total").alias(
            "bpe_per_ws_fertility"
        ),
        ratio6("bpe_tokens_total", "n_docs").alias("bpe_tokens_per_doc"),
    )


def token_entropy(
    df: DataFrame,
    content_col: str = "text",
    gate_bits: float = 4.7,
    extra_cols: tuple = (),
) -> DataFrame:
    """Shannon entropy (bits) of each document's TOKEN distribution plus
    the low-entropy gate a spam/keyword-stuffing filter keys on — low
    entropy means a few tokens dominate the document.

    Zero-shuffle per-row fold. The token array is STAGED as a projected
    column (``__toks``) so the tokenize subtree is evaluated once per
    row, not re-inlined into every lambda that references it (the
    round-11 lambda-inlining class). The entropy sum runs over counts in
    TOKEN-ASCENDING order (array_sort of the distinct tokens), the same
    deterministic order the oracle's list_transform walks, so the float
    accumulation order is engine-identical; rounding to 6 dp absorbs
    the remaining last-ulp noise of a ~types-length sum.
    """
    staged = df.withColumn("__toks", tokens(F.col(content_col)))
    t = F.col("__toks")
    n = F.size(t)
    counts = F.transform(
        F.array_sort(F.array_distinct(t)),
        lambda w: F.size(F.filter(t, lambda x: x == w)),
    )
    ent = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc
        - (c.cast("double") / n) * F.log2(c.cast("double") / n),
    )
    # ``extra_cols`` passes input columns through the projection (r14-opt):
    # lets a composition (the curation funnel) compute several map-only
    # metric operators in ONE corpus pass instead of joining their
    # narrow frames back together on doc_id. Default () keeps the
    # registered query's schema byte-identical.
    return staged.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_types"),
        F.round(ent, ROUND).alias("entropy_bits"),
        (F.round(ent, ROUND) >= F.lit(gate_bits)).alias("entropy_pass"),
        *[F.col(c) for c in extra_cols],
    )


def line_quality_gate(
    df: DataFrame,
    content_col: str = "text",
    line_tokens: int = 7,
    min_line_tokens: int = 5,
    min_distinct_frac: float = 0.7,
    extra_cols: tuple = (),
) -> DataFrame:
    """C4-style LINE-level quality filtering with document reassembly:
    split each document into lines, drop lines that fail the per-line
    gates (too short, too repetitive), and rebuild the cleaned text in
    order. The corpus documents are single-line, so lines are DERIVED
    deterministically as fixed-size token windows (``line_tokens``
    each; the trailing window keeps its remainder) — identically in the
    SQL oracle, per the pii_scrub precedent — which makes the keep/drop
    logic genuinely exercised: short trailing lines and low-distinct
    windows really are removed.

    Map-only, whole-stage codegen: one staged tokenize, then pure array
    expressions (sequence/slice/filter/array_join). At 100 TB this is a
    scan-shaped pass — no shuffle, no Python.
    """
    staged = df.withColumn("__toks", tokens(F.col(content_col)))
    t = F.col("__toks")
    n_lines = F.ceil(F.size(t) / F.lit(float(line_tokens))).cast("int")
    lines = F.when(F.size(t) == F.lit(0), F.lit([]).cast("array<array<string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.slice(t, i * line_tokens + 1, line_tokens),
        )
    )
    keep = lambda ln: (F.size(ln) >= min_line_tokens) & (  # noqa: E731
        F.size(F.array_distinct(ln)).cast("double") / F.size(ln)
        > F.lit(min_distinct_frac)
    )
    staged = staged.withColumn("__kept", F.filter(lines, keep)).withColumn(
        "__n_lines", n_lines
    )
    kept = F.col("__kept")
    # extra_cols: see token_entropy — one-pass metric composition seam.
    return staged.select(
        "doc_id",
        F.col("__n_lines").alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.round(
            F.when(
                F.col("__n_lines") > 0,
                F.size(kept).cast("double") / F.col("__n_lines"),
            ).otherwise(F.lit(0.0)),
            ROUND,
        ).alias("kept_frac"),
        F.array_join(
            F.transform(kept, lambda ln: F.array_join(ln, " ")), "\n"
        ).alias("clean_text"),
        *[F.col(c) for c in extra_cols],
    )
