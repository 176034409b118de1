"""Chunking operators (SURVEY.md §2.7 X8-X14) — the UDTF of this engine.

Two execution shapes:

1. ``chunk_fixed_expr`` — the fixed-size chunker as a pure Catalyst
   expression (transform/sequence/substring + posexplode). JVM-side,
   whole-stage-codegen'd, SQL-oracle-expressible; this is the hot path for
   a 100 TB ingest (one narrow map, no Python).
2. ``chunk_text`` / ``chunk_markdown`` / ``chunk_code`` — the
   boundary-aware chunkers as pure-Python functions applied via
   ``mapInPandas`` (one text row → N chunk rows, Arrow-batched). The
   markdown/code scanners are inherently sequential line machines, which is
   exactly the "genuinely can't express in built-ins" case for a Pandas UDF.

Reference semantics (re-expressed, not copied):
- fixed-size: window ``size``, step ``size - overlap``; text <= size → one
  chunk; trim; drop empties (`src/core/chunk/chunking.ts:42-108`). With
  ``preserve_words`` the window backtracks to the last space/newline.
- markdown boundaries: fenced code blocks kept whole, h1/h2 headings start
  sections (h3-h6 absorbed), lists and paragraphs are units; oversized
  sections split by line accumulation with trailing-line overlap
  (`src/core/chunk/boundary-aware-chunking.ts:27-293`).
- code boundaries: import block, function/class/interface/type starts,
  statement accumulation fallback (`boundary-aware-chunking.ts:298-603`).
- chunk-setting auto-optimizer: extension → (size, overlap); code 650/125,
  docs 1250/250, articles 1750/350, default 1000/200
  (`src/core/chunk/chunk-optimizer.ts:15-88`).
- line numbers: 1-based start/end from char offsets
  (`src/core/chunk/line-utils.ts:4-20`).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Chunk-setting auto-optimizer (X13).
# ---------------------------------------------------------------------------

_CODE_EXTS = {
    ".js", ".ts", ".jsx", ".tsx", ".py", ".go", ".rs", ".java", ".rb",
    ".c", ".cpp", ".h", ".hpp", ".cs", ".php", ".swift", ".kt", ".scala",
}
_DOC_EXTS = {".md", ".mdx", ".rst", ".adoc"}
_ARTICLE_EXTS = {".txt", ".html", ".htm"}

CHUNK_SETTINGS = {
    "code": (650, 125),
    "docs": (1250, 250),
    "articles": (1750, 350),
    "default": (1000, 200),
}


def optimal_chunk_settings(path_or_ext: str) -> tuple[int, int]:
    """Extension → (chunk_size, overlap) lookup (X13)."""
    ext = path_or_ext if path_or_ext.startswith(".") else "." + path_or_ext.rsplit(".", 1)[-1]
    ext = ext.lower()
    if ext in _CODE_EXTS:
        return CHUNK_SETTINGS["code"]
    if ext in _DOC_EXTS:
        return CHUNK_SETTINGS["docs"]
    if ext in _ARTICLE_EXTS:
        return CHUNK_SETTINGS["articles"]
    return CHUNK_SETTINGS["default"]


# ---------------------------------------------------------------------------
# Fixed-size chunker (X8) — Python form (exact reference semantics incl.
# preserve_words) and Catalyst-expression form (oracle-parity hot path).
# ---------------------------------------------------------------------------


def _validate(size: int, overlap: int) -> None:
    if size <= 0:
        raise ValueError("chunk size must be > 0")
    if overlap < 0 or overlap >= size:
        raise ValueError("0 <= overlap < size required")


def chunk_spans(
    text: str, size: int, overlap: int, preserve_words: bool = False
) -> list[tuple[int, int]]:
    """[start, end) char spans of each chunk before trimming.

    Window of ``size`` advancing by ``size - overlap``; with
    ``preserve_words`` a window that would split a word backtracks to the
    last space/newline inside it (never past the window start).
    """
    _validate(size, overlap)
    n = len(text)
    if n == 0:
        return []
    if n <= size:
        return [(0, n)]
    spans: list[tuple[int, int]] = []
    step = size - overlap
    start = 0
    while start < n:
        end = min(start + size, n)
        if preserve_words and end < n and not text[end].isspace():
            window = text[start:end]
            cut = max(window.rfind(" "), window.rfind("\n"))
            if cut > 0:
                end = start + cut + 1
        spans.append((start, end))
        if end >= n:
            break
        start = end - overlap if preserve_words else start + step
    return spans


def chunk_text(
    text: str, size: int = 1000, overlap: int = 200, preserve_words: bool = False
) -> list[dict]:
    """X8: trimmed, non-empty chunks with char offsets and 1-based lines."""
    out = []
    for idx, (s, e) in enumerate(chunk_spans(text, size, overlap, preserve_words)):
        raw = text[s:e]
        c = raw.strip()
        if not c:
            continue
        out.append(
            {
                "chunk_index": idx,
                "content": c,
                "start_char": s,
                "end_char": e,
                "start_line": text.count("\n", 0, s) + 1,
                "end_line": text.count("\n", 0, max(s, e - 1)) + 1,
            }
        )
    return out


def chunk_fixed_expr(
    content: Column | str, size: int, overlap: int
) -> Column:
    """The fixed-size chunker as ONE Catalyst array expression.

    Returns ARRAY<STRUCT<chunk_index INT, content STRING>> — explode with
    ``F.posexplode``/``F.inline``. Semantics: step = size - overlap,
    text <= size → single chunk, trim, empties dropped by the caller.
    JVM-side → survives a 100 TB scan inside codegen.
    """
    c = F.col(content) if isinstance(content, str) else content
    step = size - overlap
    n = F.length(c)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step)).cast("int")
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_index"),
            F.trim(F.substring(c, i * step + 1, size)).alias("content"),
        ),
    )


def sql_chunk_fixed(content_sql: str, size: int, overlap: int) -> str:
    """DuckDB SQL computing the same chunk array (list of structs)."""
    step = size - overlap
    n = f"length({content_sql})"
    n_chunks = (
        f"CASE WHEN {n} <= {size} THEN 1 "
        f"ELSE CAST(ceil(({n} - {overlap}) / CAST({step} AS DOUBLE)) AS INT) END"
    )
    return (
        f"list_transform(range(0, {n_chunks}), "
        f"i -> struct_pack(chunk_index := CAST(i AS INT), "
        f"content := trim(substr({content_sql}, i * {step} + 1, {size}))))"
    )


# ---------------------------------------------------------------------------
# Markdown boundary parser (X9/X10) — sequential line machine, Python-only.
# ---------------------------------------------------------------------------

_FENCE_RE = re.compile(r"^(```|~~~)")
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_LIST_RE = re.compile(r"^(\s*)([-*+]|\d+[.)])\s+")


@dataclass
class Section:
    type: str  # heading | code_block | list | paragraph
    level: int  # heading level (0 for non-headings)
    title: str
    start_line: int  # 1-based inclusive
    end_line: int  # 1-based inclusive
    content: str


def parse_markdown_sections(text: str) -> list[Section]:
    """Line scanner: fenced code kept whole; h1/h2 open sections (h3-h6
    absorbed into the current section); list runs and paragraphs are units."""
    lines = text.split("\n")
    sections: list[Section] = []
    cur: list[str] = []
    cur_type = "paragraph"
    cur_level = 0
    cur_title = ""
    cur_start = 1
    in_fence = False
    fence_mark = ""

    def flush(end_line: int) -> None:
        nonlocal cur, cur_type, cur_level, cur_title
        body = "\n".join(cur).strip("\n")
        if body.strip():
            sections.append(
                Section(cur_type, cur_level, cur_title, cur_start, end_line, body)
            )
        cur = []

    for i, line in enumerate(lines, start=1):
        fence = _FENCE_RE.match(line.strip())
        if in_fence:
            cur.append(line)
            if fence and line.strip().startswith(fence_mark):
                in_fence = False
                flush(i)
                cur_type, cur_level, cur_title, cur_start = "paragraph", 0, "", i + 1
            continue
        if fence:
            flush(i - 1)
            cur_type, cur_level, cur_title, cur_start = "code_block", 0, "", i
            cur = [line]
            in_fence = True
            fence_mark = fence.group(1)
            continue
        h = _HEADING_RE.match(line)
        if h and len(h.group(1)) <= 2:
            flush(i - 1)
            cur_type = "heading"
            cur_level = len(h.group(1))
            cur_title = h.group(2).strip()
            cur_start = i
            cur = [line]
            continue
        if not line.strip() and cur_type == "paragraph" and cur:
            flush(i - 1)
            cur_start = i + 1
            continue
        if _LIST_RE.match(line) and cur_type == "paragraph" and not cur:
            cur_type = "list"
            cur_start = i
        cur.append(line)
    if in_fence:
        in_fence = False
    flush(len(lines))
    return sections


def split_oversized(
    section: Section, max_size: int, overlap: int
) -> list[Section]:
    """X10: line-accumulate split with a trailing-line overlap budget."""
    if len(section.content) <= max_size:
        return [section]
    lines = section.content.split("\n")
    out: list[Section] = []
    buf: list[str] = []
    buf_len = 0
    start_line = section.start_line
    line_no = section.start_line
    for ln in lines:
        if buf and buf_len + len(ln) + 1 > max_size:
            out.append(
                Section(section.type, section.level, section.title,
                        start_line, line_no - 1, "\n".join(buf))
            )
            # trailing-line overlap <= overlap budget
            keep: list[str] = []
            keep_len = 0
            for prev in reversed(buf):
                if keep_len + len(prev) + 1 > overlap:
                    break
                keep.insert(0, prev)
                keep_len += len(prev) + 1
            start_line = line_no - len(keep)
            buf = keep[:]
            buf_len = keep_len
        buf.append(ln)
        buf_len += len(ln) + 1
        line_no += 1
    if any(s.strip() for s in buf):
        out.append(
            Section(section.type, section.level, section.title,
                    start_line, section.end_line, "\n".join(buf))
        )
    return out


def chunk_markdown(text: str, max_size: int = 1250, overlap: int = 250) -> list[dict]:
    """X9+X10: boundary-aware markdown chunks with boundary metadata."""
    out = []
    idx = 0
    for sec in parse_markdown_sections(text):
        for piece in split_oversized(sec, max_size, overlap):
            body = piece.content.strip()
            if not body:
                continue
            out.append(
                {
                    "chunk_index": idx,
                    "content": body,
                    "boundary_type": piece.type,
                    "boundary_level": piece.level,
                    "boundary_title": piece.title,
                    "start_line": piece.start_line,
                    "end_line": piece.end_line,
                }
            )
            idx += 1
    return out


# ---------------------------------------------------------------------------
# Code boundary parser (X11, the CST-fallback regex scanner).
# ---------------------------------------------------------------------------

_IMPORT_RE = re.compile(r"^\s*(import|from|#include|use|require|using)\b")
_DEF_RE = re.compile(
    r"^\s*(export\s+)?(default\s+)?"
    r"(async\s+)?(function|def|class|interface|type|struct|enum|impl|fn|func)\b\s*"
    r"([A-Za-z_][A-Za-z0-9_]*)?"
)


def parse_code_boundaries(text: str) -> list[Section]:
    """Regex scanner: leading import block, then one section per top-level
    function/class/interface/type definition; other statements accumulate."""
    lines = text.split("\n")
    sections: list[Section] = []
    cur: list[str] = []
    cur_type, cur_name, cur_start = "statements", "", 1

    def flush(end_line: int) -> None:
        nonlocal cur
        body = "\n".join(cur).strip("\n")
        if body.strip():
            sections.append(Section(cur_type, 0, cur_name, cur_start, end_line, body))
        cur = []

    in_imports = True
    for i, line in enumerate(lines, start=1):
        if in_imports:
            if _IMPORT_RE.match(line) or not line.strip():
                cur_type = "imports"
                cur.append(line)
                continue
            flush(i - 1)
            in_imports = False
            cur_type, cur_name, cur_start = "statements", "", i
        d = _DEF_RE.match(line)
        if d and not line[0].isspace():
            flush(i - 1)
            cur_type = d.group(4)
            cur_name = d.group(5) or ""
            cur_start = i
        cur.append(line)
    flush(len(lines))
    return sections


def chunk_code(text: str, max_size: int = 650, overlap: int = 125) -> list[dict]:
    """X11: code chunks on definition boundaries, oversized ones split."""
    out = []
    idx = 0
    for sec in parse_code_boundaries(text):
        for piece in split_oversized(sec, max_size, overlap):
            body = piece.content.strip()
            if not body:
                continue
            out.append(
                {
                    "chunk_index": idx,
                    "content": body,
                    "boundary_type": piece.type,
                    "boundary_level": 0,
                    "boundary_title": piece.title,
                    "start_line": piece.start_line,
                    "end_line": piece.end_line,
                }
            )
            idx += 1
    return out


# ---------------------------------------------------------------------------
# Distributed chunking: one text row → N chunk rows via mapInPandas.
# ---------------------------------------------------------------------------

CHUNK_SCHEMA = StructType(
    [
        StructField("source_id", StringType()),
        StructField("chunk_index", IntegerType()),
        StructField("total_chunks", IntegerType()),
        StructField("content", StringType()),
        StructField("boundary_type", StringType()),
        StructField("boundary_level", IntegerType()),
        StructField("boundary_title", StringType()),
        StructField("start_line", LongType()),
        StructField("end_line", LongType()),
    ]
)

_STRATEGIES = {
    "fixed": lambda t, s, o: [
        {**c, "boundary_type": "fixed", "boundary_level": 0, "boundary_title": ""}
        for c in chunk_text(t, s, o)
    ],
    "markdown": chunk_markdown,
    "code": chunk_code,
}


def chunk_documents(
    df: DataFrame,
    id_col: str = "source_id",
    content_col: str = "content",
    strategy: str = "fixed",
    size: int = 1000,
    overlap: int = 200,
    lang_col: str | None = None,
) -> DataFrame:
    """UDTF: (source_id, content) → chunk rows, Arrow-batched.

    mapInPandas streams record batches — a 100 TB ingest never materializes
    a full partition in memory, and chunking is embarrassingly parallel
    (narrow, no shuffle). ``strategy="cst"`` routes each row through the
    CST boundary extractor (operators/cst.py) using ``lang_col`` for the
    per-row language (falling back to the regex scanner, X11, when no
    parser exists or the code doesn't parse).
    """
    if strategy == "cst":
        from gistdex_spark.operators.cst import chunk_cst

        cols = [
            F.col(id_col).cast("string").alias("source_id"),
            F.col(content_col).alias("content"),
        ]
        cols.append(
            (F.col(lang_col) if lang_col else F.lit(None).cast("string")).alias("lang")
        )
        src = df.select(*cols)

        def run_cst(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for sid, text, lang in zip(
                    pdf["source_id"], pdf["content"], pdf["lang"]
                ):
                    chunks = chunk_cst(text or "", size, overlap, language=lang)
                    total = len(chunks)
                    for c in chunks:
                        rows.append(
                            (
                                sid, c["chunk_index"], total, c["content"],
                                c["boundary_type"], c["boundary_level"],
                                c["boundary_title"],
                                c.get("start_line", 1), c.get("end_line", 1),
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in CHUNK_SCHEMA.fields]
                )

        return src.mapInPandas(run_cst, CHUNK_SCHEMA)

    chunker = _STRATEGIES[strategy]
    src = df.select(
        F.col(id_col).cast("string").alias("source_id"),
        F.col(content_col).alias("content"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, text in zip(pdf["source_id"], pdf["content"]):
                chunks = chunker(text or "", size, overlap)
                total = len(chunks)
                for c in chunks:
                    rows.append(
                        (
                            sid,
                            c["chunk_index"],
                            total,
                            c["content"],
                            c["boundary_type"],
                            c["boundary_level"],
                            c["boundary_title"],
                            c.get("start_line", 1),
                            c.get("end_line", 1),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA.fields])

    return src.mapInPandas(run, CHUNK_SCHEMA)


def register_chunk_udtf(spark) -> None:
    """SQL-surface chunker as a Python UDTF (Spark 4): one text row ->
    N (chunk_index, content, start, end) rows, usable as
    ``SELECT c.* FROM docs, LATERAL chunk_udtf(text, 200, 40) c``.

    This is the UDF-4 dispatch surface in SQL form; the PERFORMANCE path
    remains the Arrow-batched mapInPandas pipeline (chunk_documents) —
    UDTFs evaluate row-at-a-time Python and exist here for SQL
    ergonomics, not throughput."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_index: int, content: string, start: int, end: int")
    class ChunkUdtf:
        def eval(self, text: str, size: int, overlap: int):
            if text is None:
                return
            for i, (s, e) in enumerate(chunk_spans(text, size, overlap)):
                yield i, text[s:e], s, e

    spark.udtf.register("chunk_udtf", ChunkUdtf)
