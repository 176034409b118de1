"""ci:doc pipeline (SURVEY.md §3.3, J6-J8, X16-X18): doc impact analysis.

Reference flow (`src/core/ci/doc-service.ts:178-360`): git diff → extract
changed symbols/hunks per file → generate <=30 search queries → hybrid
search each query against indexed docs → threshold 0.7 → per-doc keep the
max-similarity match with the union of matched terms.

Spark-first shape: the reference's sequential 30-query loop becomes ONE
queries × chunks similarity join (broadcast the query side), then a window
max per doc — the flagship "analytics-engine" pipeline of the reference.
Git/diff parsing is driver-side text work (the diff is KB-sized); the
joins/aggregations are the distributed part.

Symbol extraction (X16) and query generation (X17) are re-expressed
per-language regex scans; diff hunk parsing (X18) handles unified diff.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gistdex_spark.operators.similarity import best_match_per_doc, similarity_join

# X16: per-language top-level definition regexes (fallback path of the
# reference's CST harvest, `diff-analyzer.ts:165-441`).
_SYMBOL_RES = [
    re.compile(r"\b(?:function|class|interface|type|enum)\s+([A-Za-z_$][\w$]*)"),
    re.compile(r"\bdef\s+([A-Za-z_]\w*)"),
    re.compile(r"\b(?:fn|func)\s+([A-Za-z_]\w*)"),
    re.compile(r"\b(?:const|let|var)\s+([A-Za-z_$][\w$]*)\s*="),
]

_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")


def extract_symbols(code: str) -> list[str]:
    """X16: harvest defined symbol names; first-seen order, deduped."""
    seen: dict[str, None] = {}
    for rx in _SYMBOL_RES:
        for m in rx.finditer(code):
            seen.setdefault(m.group(1), None)
    return list(seen)


def split_identifier(name: str) -> str:
    """camelCase / snake_case / kebab-case → space-separated words (X17)."""
    s = name.replace("_", " ").replace("-", " ")
    s = _CAMEL_RE.sub(" ", s)
    return " ".join(w.lower() for w in s.split() if w)


def extract_hunks(diff_text: str, context: int = 3) -> list[dict]:
    """X18: per-file changed (+/-) lines from a unified diff."""
    files: list[dict] = []
    cur: dict | None = None
    for line in diff_text.split("\n"):
        if line.startswith("+++ b/"):
            cur = {"file_path": line[6:], "added": [], "removed": []}
            files.append(cur)
        elif cur is None or line.startswith(("---", "@@", "diff ", "index ")):
            continue
        elif line.startswith("+"):
            cur["added"].append(line[1:])
        elif line.startswith("-"):
            cur["removed"].append(line[1:])
    return files


def generate_queries(hunks: list[dict], cap: int = 30) -> list[dict]:
    """X17: path components + symbol-name variants + 2/3-word phrases,
    deduped, capped at 30 (`diff-analyzer.ts:446-533`)."""
    out: list[str] = []
    seen: set[str] = set()

    def add(q: str) -> None:
        q = q.strip()
        if q and q not in seen:
            seen.add(q)
            out.append(q)

    for h in hunks:
        base = h["file_path"].rsplit("/", 1)[-1].rsplit(".", 1)[0]
        for part in h["file_path"].split("/"):
            stem = part.rsplit(".", 1)[0]
            if len(stem) > 2:
                add(split_identifier(stem))
        changed = "\n".join(h["added"] + h["removed"])
        for sym in extract_symbols(changed):
            add(split_identifier(sym))
        words = [w for w in re.split(r"\W+", changed) if len(w) > 2][:6]
        if len(words) >= 2:
            add(" ".join(words[:2]).lower())
        if len(words) >= 3:
            add(" ".join(words[:3]).lower())
        add(split_identifier(base))
    return [{"query_id": i, "query": q} for i, q in enumerate(out[:cap])]


def doc_impact(
    spark: SparkSession,
    queries: list[dict],
    corpus: DataFrame,
    embed,
    threshold: float = 0.7,
    k_per_query: int = 10,
    doc_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """J6 + W5 end-to-end: embed queries (driver-side, <=30 rows), ONE
    broadcast similarity join against the corpus, threshold, per-doc best.

    Returns (doc, best_sim, best_query, matched_queries, match_count).
    """
    qrows = [(q["query_id"], q["query"], embed(q["query"])) for q in queries]
    qdf = spark.createDataFrame(
        qrows, schema="query_id INT, query STRING, query_vec ARRAY<DOUBLE>"
    )
    matches = similarity_join(
        qdf,
        corpus,
        threshold=threshold,
        k_per_query=k_per_query,
        corpus_id=doc_col,
        corpus_vec=vec_col,
    )
    return best_match_per_doc(matches, doc_col=doc_col)


def doc_path(
    file_path: str = "file_path", path: str = "path", repo_root: str = ""
) -> F.Column:
    """F10 (`doc-service.ts:247-266`): the doc's display path is
    coalesce(metadata.filePath, metadata.path), normalized from absolute
    to repo-relative. Pure column expression — stays in codegen."""
    p = F.coalesce(F.col(file_path), F.col(path))
    if repo_root:
        p = F.regexp_replace(p, "^" + re.escape(repo_root.rstrip("/")) + "/", "")
    return p


def best_relevant_change(
    results: DataFrame,
    changes: list[dict],
    query_col: str = "best_query",
) -> DataFrame:
    """J8: priority cascade — symbol-exact > filename-contains >
    content-contains — via three broadcast left joins + coalesce."""
    spark = results.sparkSession
    ch = spark.createDataFrame(
        [(c["file_path"], " ".join(c.get("symbols", [])), c.get("content", "")) for c in changes],
        schema="file_path STRING, symbols STRING, content STRING",
    )
    q = F.col(query_col)
    j = (
        results.crossJoin(F.broadcast(ch))
        .withColumn(
            "prio",
            F.when(F.col("symbols").contains(q), 1)
            .when(F.col("file_path").contains(q), 2)
            .when(F.col("content").contains(q), 3),
        )
        .filter(F.col("prio").isNotNull())
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*results.columns).orderBy("prio", "file_path")
    best = j.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.select(*results.columns, F.col("file_path").alias("relevant_change"))
