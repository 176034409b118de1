"""CLI surface mirroring the reference's command table.

The reference dispatches ``index / query / list / info / init / version /
ci:doc`` through a gunshi command table (`src/cli/index.ts:148-164,291-300`)
with per-command handlers under `src/cli/commands/`; ``--mcp`` switches the
process into a stdio MCP server (`src/cli/utils/special-flags.ts`). This
module is the Spark-native equivalent: argparse subcommands over the
:class:`gistdex_spark.api.GistdexSpark` facade, each handler a thin
formatter around a DataFrame the engine planned — the CLI never loops over
rows the engine could aggregate.

Design notes:
- ``main(argv)`` builds a SparkSession lazily; ``run(args, spark)`` takes an
  injected session so tests drive commands in-process against the shared
  fixture session (the reference tests its handlers the same way —
  `src/cli/commands/query.test.ts` injects a service).
- Output formats follow the reference handlers' console shapes
  (`query.ts:27-156`, `list.ts:14-100`, `info.ts:10-22`) so a user's
  muscle memory — and any scripts scraping the output — carry over.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from gistdex_spark import __version__ as VERSION

DEFAULT_DB = ".gistdex/chunks"
CONFIG_FILE = "gistdex.config.json"


def _spark():
    from gistdex_spark.session import get_spark

    return get_spark("gistdex-cli", cpus=os.environ.get("SPARK_GRAFT_CPUS", "4"))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gistdex-spark",
        description="Spark-native gistdex: index, search and analyze content.",
    )
    p.add_argument("--mcp", action="store_true", help="run as a stdio MCP server")
    p.add_argument(
        "--db",
        dest="mcp_db",
        default=DEFAULT_DB,
        help="chunk store path for --mcp mode",
    )
    p.add_argument("--version", action="store_true", help="print version and exit")
    sub = p.add_subparsers(dest="command")

    def common(sp):
        sp.add_argument("--db", default=DEFAULT_DB, help="chunk store path")
        sp.add_argument(
            "--provider", default="parquet", help="storage adapter (parquet/orc/...)"
        )

    sp = sub.add_parser("version", help="print version")

    sp = sub.add_parser("init", help="write a starter config file")
    common(sp)
    sp.add_argument("--force", action="store_true")

    sp = sub.add_parser("index", help="index content into the chunk store")
    common(sp)
    sp.add_argument("--text", help="raw text to index (S10)")
    sp.add_argument("--title", help="title for --text")
    sp.add_argument("--file", help="single file path")
    sp.add_argument("--files", help="glob pattern of files")
    sp.add_argument("--gist", help="GitHub Gist URL")
    sp.add_argument("--github", help="GitHub repository URL")
    sp.add_argument("--chunk-size", type=int, default=1000)
    sp.add_argument("--chunk-overlap", type=int, default=200)
    sp.add_argument(
        "--no-preserve-boundaries",
        action="store_true",
        help="plain fixed-window chunking instead of boundary-aware",
    )
    sp.add_argument(
        "--base-dir",
        help="explicitly allow file reads under this directory "
        "(default: cwd-relative safe paths only)",
    )

    sp = sub.add_parser("query", help="search indexed content")
    common(sp)
    sp.add_argument("terms", nargs="+", help="query text")
    sp.add_argument("-k", "--top-k", type=int, default=5)
    sp.add_argument("--type", help="filter by source type")
    sp.add_argument("-y", "--hybrid", action="store_true")
    sp.add_argument("--no-rerank", action="store_true")
    sp.add_argument("--full", action="store_true", help="show full original content")
    sp.add_argument("--section", action="store_true", help="show full markdown section")

    sp = sub.add_parser("list", help="list indexed items")
    common(sp)
    sp.add_argument("--type", help="filter by source type")
    sp.add_argument("--stats", action="store_true", help="statistics only")
    sp.add_argument("--by-extension", action="store_true")
    sp.add_argument("--by-source", action="store_true")
    sp.add_argument("--detailed", action="store_true", help="all sources, not top 10")
    sp.add_argument("--limit", type=int, default=100)

    sp = sub.add_parser("info", help="adapter information")
    common(sp)

    sp = sub.add_parser("ci-doc", help="find docs impacted by a diff")
    common(sp)
    sp.add_argument("--diff", required=True, help="path to a unified diff file")
    sp.add_argument("-k", "--top-k", type=int, default=3)
    sp.add_argument(
        "--threshold", type=float, default=0.65, help="impact score threshold"
    )
    sp.add_argument(
        "--format",
        choices=("text", "markdown", "json"),
        default="text",
        help="output format: plain list, GitHub-comment markdown, or the "
        "CI JSON envelope (formatters.ts)",
    )
    return p


# -- handlers ---------------------------------------------------------------


def _engine(args, spark):
    from gistdex_spark.api import GistdexSpark

    return GistdexSpark(spark, args.db)


def cmd_version(args, spark, out) -> int:
    print(f"gistdex-spark {VERSION}", file=out)
    return 0


def cmd_init(args, spark, out) -> int:
    """`init.ts`: write a starter config; refuse to clobber without --force."""
    if os.path.exists(CONFIG_FILE) and not args.force:
        print(f"{CONFIG_FILE} already exists (use --force to overwrite)", file=out)
        return 1
    with open(CONFIG_FILE, "w") as f:
        json.dump(
            {
                "vectorDB": {
                    "provider": args.provider,
                    "options": {"path": args.db},
                },
                "indexing": {"chunkSize": 1000, "chunkOverlap": 200},
            },
            f,
            indent=2,
        )
    print(f"Wrote {CONFIG_FILE}", file=out)
    return 0


def cmd_index(args, spark, out) -> int:
    eng = _engine(args, spark)
    strategy = "fixed" if args.no_preserve_boundaries else None
    if args.text:
        texts = spark.createDataFrame(
            [
                (
                    args.title or "text-input",
                    args.text,
                    "text",
                    args.title or "Text input",
                )
            ],
            schema="source_id STRING, content STRING, source_type STRING, title STRING",
        )
        written = eng.index_text(
            texts,
            strategy=strategy or "fixed",
            size=args.chunk_size,
            overlap=args.chunk_overlap,
        )
    elif args.file or args.files:
        # The security gate (`security.ts:48-183`) allowlists cwd-relative
        # dirs by default; --base-dir is the explicit user opt-in for
        # anything else, same as the reference's config baseDir.
        kw = {}
        if args.base_dir:
            kw = {
                "base_dir": args.base_dir,
                "allowed_base_paths": (args.base_dir,),
            }
        written = eng.index_files(
            args.file or args.files,
            strategy=strategy,
            size=args.chunk_size,
            overlap=args.chunk_overlap,
            **kw,
        )
    elif args.gist or args.github:
        # S4/S5: the fetch layer is injectable (`sources/github.py:174`);
        # the default fetch_fn raises a clean no-network error in offline
        # environments — same failure mode as the reference without a token.
        from pyspark.sql import functions as F

        from gistdex_spark.sources import github as gh

        url = args.gist or args.github
        info = gh.parse_gist_url(url) if args.gist else gh.parse_repo_url(url)
        tree = [info.get("file") or "README.md"]
        try:
            fetched = gh.fetch_repo_files(spark, url, tree)
            texts = fetched.select(
                F.col("source_id"),
                F.col("content"),
                F.col("source_type"),
                F.col("path").alias("title"),
            )
            written = eng.index_text(
                texts, size=args.chunk_size, overlap=args.chunk_overlap
            )
        except Exception as e:  # noqa: BLE001 — report, don't traceback
            print(f"Fetch failed: {e}", file=out)
            return 1
    else:
        print("Nothing to index: pass --text/--file/--files/--gist/--github", file=out)
        return 1
    n = written.count()
    print(f"Indexed {n} chunks into {args.db}", file=out)
    return 0


def cmd_query(args, spark, out) -> int:
    """`query.ts:27-156`: numbered results, 200-char truncation, stats tail."""
    if args.full and args.section:
        print("Cannot use both --full and --section options together", file=out)
        return 1
    query = " ".join(args.terms)
    eng = _engine(args, spark)
    print(f'Searching for: "{query}"\n', file=out)
    results = eng.search(
        query,
        k=args.top_k,
        source_type=args.type,
        rerank=not args.no_rerank,
        hybrid=args.hybrid,
    ).collect()
    if not results:
        print("No results found", file=out)
        return 0

    if args.full and args.top_k == 1 and len(results) == 1:
        full = eng.original_content(results[0]["source_id"]).collect()
        print(full[0]["content"] if full else results[0]["content"], file=out)
        return 0

    print(f"Found {len(results)} results\n", file=out)
    for i, r in enumerate(results, 1):
        title = (r["title"] if "title" in r.asDict() else None) or "(Untitled)"
        print(f"{i}. {title}", file=out)
        print(f"   Score: {r['score']:.3f}", file=out)
        stype = (r["source_type"] if "source_type" in r.asDict() else None) or "unknown"
        print(f"   Type: {stype}", file=out)
        content = r["content"] or ""
        if args.full:
            rows = eng.original_content(r["source_id"]).collect()
            if rows:
                content = rows[0]["content"]
        elif args.section and "boundary_title" in eng.chunks().columns:
            rows = eng.section_content(r["source_id"], title).collect()
            if rows:
                content = rows[0]["content"]
        shown = content if (args.full or args.section) else content[:200]
        for line in shown.split("\n"):
            print(f"   | {line}", file=out)
        if not args.full and not args.section and len(content) > 200:
            print("   | ...", file=out)
        print(file=out)

    scores = [r["score"] for r in results]
    print("Search Statistics:", file=out)
    print(f"  Average Score: {sum(scores) / len(scores):.3f}", file=out)
    print(f"  Score Range: {min(scores):.3f} - {max(scores):.3f}", file=out)
    return 0


def cmd_list(args, spark, out) -> int:
    """`list.ts:14-100`: census header, then extension and/or source groups.

    The reference fetches up to 10k items and groups them in JS; here each
    grouping is one hash-agg the engine plans — the driver only formats."""
    from pyspark.sql import functions as F

    eng = _engine(args, spark)
    chunks = eng.chunks()
    if args.type:
        chunks = chunks.filter(F.col("source_type") == args.type)

    by_type = (
        chunks.groupBy("source_type").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    total = sum(r["n"] for r in by_type)
    n_sources = chunks.select("source_id").distinct().count()
    print(f"Database Provider: {args.provider}", file=out)
    print(f"Total chunks: {total}", file=out)
    print(f"Unique sources: {n_sources}", file=out)
    if by_type:
        print("\nChunks by source type:", file=out)
        for r in sorted(by_type, key=lambda r: -r["n"]):
            print(f"  {r['source_type'] or 'unknown'}: {r['n']}", file=out)
    if args.stats:
        return 0

    if args.by_extension:
        ext = (
            chunks.withColumn(
                "ext",
                F.when(
                    F.col("source_id").rlike(r"\.[A-Za-z0-9]+$"),
                    F.regexp_extract("source_id", r"(\.[A-Za-z0-9]+)$", 1),
                ).otherwise("(none)"),
            )
            .groupBy("ext")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("source_id").alias("n_sources"),
            )
            .orderBy(F.desc("n"), F.asc("ext"))
            .collect()
        )
        print("\n=== Extension Statistics ===", file=out)
        for r in ext:
            print(
                f"  {r['ext']}: {r['n']} chunks from {r['n_sources']} source(s)",
                file=out,
            )

    if args.by_source or not (args.by_extension or args.stats):
        srcs = (
            chunks.groupBy("source_id", "source_type")
            .agg(F.count(F.lit(1)).alias("n_chunks"))
            .orderBy(F.desc("n_chunks"), F.asc("source_id"))
        )
        if not args.detailed:
            srcs = srcs.limit(args.limit)
        print("\n=== Sources Summary ===", file=out)
        for r in srcs.collect():
            print(f"\n  {r['source_id']}", file=out)
            print(f"    Type: {r['source_type'] or 'unknown'}", file=out)
            print(f"    Chunks: {r['n_chunks']}", file=out)
    return 0


def cmd_info(args, spark, out) -> int:
    """`info.ts:10-22`: provider, version, capabilities."""
    from gistdex_spark.sources.adapters import DEFAULT_REGISTRY

    print("Database Adapter Information:", file=out)
    print(f"  Provider: {args.provider}", file=out)
    print(f"  Version: {VERSION}", file=out)
    print("  Capabilities:", file=out)
    for cap in (
        "bulk columnar ingest",
        "semantic / hybrid search",
        "source reconstruction",
        "predicate-pushdown scans",
    ):
        print(f"    - {cap}", file=out)
    print(
        f"  Registered providers: {sorted(DEFAULT_REGISTRY.list_providers())}",
        file=out,
    )
    return 0


def cmd_ci_doc(args, spark, out) -> int:
    """`ci-doc.ts` → analyzeDocuments: diff hunks → generated queries →
    ONE broadcast similarity join over the indexed store → per-doc best."""
    from pyspark.sql import functions as F

    from gistdex_spark.functions.embedder import embed_text
    from gistdex_spark.operators.cidoc import doc_impact, extract_hunks, generate_queries

    eng = _engine(args, spark)
    with open(args.diff) as f:
        hunks = extract_hunks(f.read())
    queries = generate_queries(hunks)
    if not queries:
        print("No queries generated from diff", file=out)
        return 0
    impacted = doc_impact(
        spark,
        queries,
        eng.chunks(),
        lambda q: embed_text(q, eng.dim),
        threshold=args.threshold,
        doc_col="source_id",
    )
    rows = (
        impacted.orderBy(F.desc("best_sim"), F.asc("source_id"))
        .limit(args.top_k)
        .collect()
    )
    fmt = getattr(args, "format", "text")
    if fmt in ("markdown", "json"):
        from gistdex_spark.operators.ci_formatters import (
            format_github_comment,
            format_json,
        )

        results = [
            {
                "file": r["source_id"],
                "similarity": float(r["best_sim"]),
                "change_type": "modified",
                "matched_terms": list(r["matched_queries"] or []),
            }
            for r in rows
        ]
        render = format_github_comment if fmt == "markdown" else format_json
        print(render(results, args.threshold), file=out)
        return 0
    if not rows:
        print("No impacted documents above threshold", file=out)
        return 0
    print(f"Found {len(rows)} impacted document(s):", file=out)
    for r in rows:
        print(
            f"  {r['source_id']}  score={r['best_sim']:.3f}"
            f"  matches={r['match_count']}",
            file=out,
        )
    return 0


HANDLERS = {
    "version": cmd_version,
    "init": cmd_init,
    "index": cmd_index,
    "query": cmd_query,
    "list": cmd_list,
    "info": cmd_info,
    "ci-doc": cmd_ci_doc,
}


def run(argv: list[str], spark=None, out=None) -> int:
    """Parse and dispatch. ``spark``/``out`` are injectable for tests."""
    out = out or sys.stdout
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.version:
        print(f"gistdex-spark {VERSION}", file=out)
        return 0
    if args.mcp:
        from gistdex_spark.mcp_server import serve

        return serve(spark or _spark(), sys.stdin, sys.stdout, db=args.mcp_db)
    if not args.command:
        parser.print_help(out)
        return 0
    if args.command in ("version",):
        return HANDLERS[args.command](args, None, out)
    return HANDLERS[args.command](args, spark or _spark(), out)


def main() -> int:
    return run(sys.argv[1:])


if __name__ == "__main__":
    sys.exit(main())
