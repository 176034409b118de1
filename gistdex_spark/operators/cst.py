"""CST-boundary extraction (SURVEY.md §2.7 X12) without tree-sitter.

The reference parses code with tree-sitter and emits the OUTERMOST
boundary nodes (functions, classes, interfaces, type aliases, imports,
variable declarations), folding an ``export_statement`` /
``decorated_definition`` parent's text into the boundary while keeping the
inner node's type and name (`src/core/chunk/cst-operations.ts:25-110`,
node inventory `src/core/chunk/language-node-types.ts:6-130`). tree-sitter
wheels are not installable in this container, so this module re-creates the
same contract two ways:

- **Python: the stdlib ``ast`` module** — a genuine parse, not a heuristic.
  Boundary statements are mapped to the tree-sitter node-type names
  (``function_definition``, ``class_definition``, ``import_statement``,
  ``import_from_statement``, ``assignment``), decorators extend the span
  exactly like ``decorated_definition``, and non-boundary compound
  statements (if/try/with/loops) are descended into just like the
  reference's traversal.
- **JS / TS / TSX: a lexer-driven scanner** — comments, string/template
  literals and nesting are tokenized properly (not regex-matched), brace
  matching finds the true end of each declaration, and everything inside an
  emitted boundary is suppressed (the reference's ``insideBoundary`` rule).

Anything else falls back to the regex statement scanner in
``chunking.parse_code_boundaries`` — the same graceful-degradation contract
as the reference's ``chunkWithFallback`` (`cst-operations.ts:148-189`).
"""

from __future__ import annotations

import ast
from dataclasses import dataclass

__all__ = [
    "Boundary",
    "extract_boundaries",
    "boundaries_to_chunks",
    "chunk_cst",
    "cst_language_for_ext",
]


@dataclass
class Boundary:
    type: str  # tree-sitter node-type name, e.g. "function_declaration"
    name: str | None
    start: int  # char offset, inclusive (modifier included)
    end: int  # char offset, exclusive
    text: str


# ---------------------------------------------------------------------------
# Python — stdlib ast.
# ---------------------------------------------------------------------------

_PY_COMPOUND_BODIES = ("body", "orelse", "finalbody", "handlers")


def _py_offsets(code: str) -> list[int]:
    """Cumulative char offset of each 1-based line start."""
    offsets = [0]
    for line in code.split("\n"):
        offsets.append(offsets[-1] + len(line) + 1)
    return offsets


def _extract_python(code: str) -> list[Boundary]:
    tree = ast.parse(code)
    line0 = _py_offsets(code)
    out: list[Boundary] = []

    def pos(lineno: int, col: int) -> int:
        return line0[lineno - 1] + col

    def visit(stmts: list[ast.stmt]) -> None:
        for node in stmts:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                btype = (
                    "class_definition"
                    if isinstance(node, ast.ClassDef)
                    else "function_definition"
                )
                # decorated_definition modifier: span opens at the first
                # decorator, type/name stay the inner definition's.
                if node.decorator_list:
                    first = node.decorator_list[0]
                    # back up over the "@" (ast points at the expression)
                    start = pos(first.lineno, max(0, first.col_offset - 1))
                else:
                    start = pos(node.lineno, node.col_offset)
                end = pos(node.end_lineno, node.end_col_offset)
                out.append(Boundary(btype, node.name, start, end, code[start:end]))
                continue  # children inside a boundary are suppressed
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                btype = (
                    "import_from_statement"
                    if isinstance(node, ast.ImportFrom)
                    else "import_statement"
                )
                start = pos(node.lineno, node.col_offset)
                end = pos(node.end_lineno, node.end_col_offset)
                out.append(Boundary(btype, None, start, end, code[start:end]))
                continue
            if isinstance(node, (ast.Assign, ast.AnnAssign, ast.AugAssign)):
                start = pos(node.lineno, node.col_offset)
                end = pos(node.end_lineno, node.end_col_offset)
                target = (
                    node.targets[0]
                    if isinstance(node, ast.Assign)
                    else node.target
                )
                name = target.id if isinstance(target, ast.Name) else None
                out.append(Boundary("assignment", name, start, end, code[start:end]))
                continue
            # non-boundary compound statement: descend, same boundary state
            for field in _PY_COMPOUND_BODIES:
                inner = getattr(node, field, None)
                if isinstance(inner, list):
                    for item in inner:
                        if isinstance(item, ast.stmt):
                            visit([item])
                        elif isinstance(item, ast.ExceptHandler):
                            visit(item.body)

    visit(tree.body)
    return out


# ---------------------------------------------------------------------------
# JS / TS / TSX — lexer + boundary scanner.
# ---------------------------------------------------------------------------

_ID_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_$")
_ID_CONT = _ID_START | set("0123456789")
# tokens after which a "/" starts a regex literal, not division
_REGEX_PRECEDERS = {
    "(", ",", "=", ":", "[", "!", "&", "|", "?", "{", "}", ";", "=>",
    "return", "typeof", "instanceof", "in", "of", "new", "do", "else",
    "case", "+", "-", "*", "%", "<", ">", None,
}


def _tokenize_js(code: str) -> list[tuple[str, int, int]]:
    """(token, start, end) with comments/whitespace dropped and string,
    template, and regex literals each emitted as one opaque token."""
    toks: list[tuple[str, int, int]] = []
    i, n = 0, len(code)
    template_depth: list[int] = []  # ${} nesting counts inside templates

    def last_tok() -> str | None:
        return toks[-1][0] if toks else None

    while i < n:
        ch = code[i]
        if ch in " \t\r\n":
            i += 1
            continue
        if ch == "/" and i + 1 < n and code[i + 1] == "/":
            j = code.find("\n", i)
            i = n if j < 0 else j
            continue
        if ch == "/" and i + 1 < n and code[i + 1] == "*":
            j = code.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if ch in "'\"":
            j = i + 1
            while j < n and code[j] != ch:
                j += 2 if code[j] == "\\" else 1
            toks.append(("<str>", i, min(j + 1, n)))
            i = min(j + 1, n)
            continue
        if ch == "`":
            j = i + 1
            depth = 0
            while j < n:
                if code[j] == "\\":
                    j += 2
                    continue
                if code[j] == "$" and j + 1 < n and code[j + 1] == "{":
                    depth += 1
                    j += 2
                    continue
                if depth and code[j] == "}":
                    depth -= 1
                    j += 1
                    continue
                if not depth and code[j] == "`":
                    j += 1
                    break
                j += 1
            toks.append(("<str>", i, j))
            i = j
            continue
        if ch == "/" and last_tok() in _REGEX_PRECEDERS:
            j = i + 1
            in_class = False
            while j < n and (in_class or code[j] != "/"):
                if code[j] == "\\":
                    j += 2
                    continue
                if code[j] == "[":
                    in_class = True
                elif code[j] == "]":
                    in_class = False
                elif code[j] == "\n":
                    break  # not a regex after all; bail to division
                j += 1
            toks.append(("<re>", i, min(j + 1, n)))
            i = min(j + 1, n)
            continue
        if ch in _ID_START:
            j = i + 1
            while j < n and code[j] in _ID_CONT:
                j += 1
            toks.append((code[i:j], i, j))
            i = j
            continue
        if ch == "=" and code[i : i + 2] == "=>":
            toks.append(("=>", i, i + 2))
            i += 2
            continue
        toks.append((ch, i, i + 1))
        i += 1
    return toks


def _match_brace(toks: list[tuple[str, int, int]], k: int) -> int:
    """Index of the token closing the bracket opened at toks[k]."""
    if k >= len(toks):
        return len(toks) - 1
    opener = toks[k][0]
    closer = {"{": "}", "(": ")", "[": "]"}[opener]
    depth = 0
    for j in range(k, len(toks)):
        t = toks[j][0]
        if t == opener:
            depth += 1
        elif t == closer:
            depth -= 1
            if depth == 0:
                return j
    return len(toks) - 1


def _stmt_end(toks: list[tuple[str, int, int]], k: int) -> int:
    """Index of the ';' ending the statement starting at toks[k] (brackets
    skipped); stops before a '}' that closes an enclosing block, or EOF."""
    depth = 0
    j = k
    while j < len(toks):
        t = toks[j][0]
        if t in "([{":
            depth += 1
        elif t in ")]}":
            if depth == 0 and t == "}":
                return j - 1
            depth -= 1
        elif t == ";" and depth == 0:
            return j
        j += 1
    return len(toks) - 1


def _extract_js(code: str, language: str) -> list[Boundary]:
    ts = language in ("typescript", "tsx")
    toks = _tokenize_js(code)
    out: list[Boundary] = []
    k = 0

    def tok(j: int) -> str | None:
        return toks[j][0] if 0 <= j < len(toks) else None

    def emit(btype: str, name: str | None, start_tok: int, end_tok: int,
             mod_start_tok: int | None = None) -> int:
        s = toks[mod_start_tok if mod_start_tok is not None else start_tok][1]
        e = toks[end_tok][2]
        out.append(Boundary(btype, name, s, e, code[s:e]))
        return end_tok + 1

    def scan_decl(j: int, mod: int | None) -> int | None:
        """Try to read a boundary declaration starting at token j; returns
        the next token index after it, or None if j isn't a boundary."""
        t = tok(j)
        if t == "async" and tok(j + 1) == "function":
            return scan_function(j, j + 1, mod)
        if t == "function":
            return scan_function(j, j, mod)
        if t == "class":
            name = tok(j + 1) if _is_ident(tok(j + 1)) else None
            b = j + 1
            while b < len(toks) and tok(b) != "{":
                b += 1
            return emit("class_declaration", name, j, _match_brace(toks, b), mod)
        if ts and t == "interface" and _is_ident(tok(j + 1)):
            b = j + 1
            while b < len(toks) and tok(b) != "{":
                b += 1
            return emit("interface_declaration", tok(j + 1), j, _match_brace(toks, b), mod)
        if ts and t == "type" and _is_ident(tok(j + 1)) and tok(j + 2) in ("=", "<"):
            return emit("type_alias_declaration", tok(j + 1), j, _stmt_end(toks, j), mod)
        if t in ("const", "let", "var"):
            btype = "variable_declaration" if t == "var" else "lexical_declaration"
            # tree-sitter's name fallback looks only at DIRECT children
            # (keyword + variable_declarator) and finds no identifier, so
            # declarations carry no name — mirrored here.
            return emit(btype, None, j, _stmt_end(toks, j), mod)
        return None

    def scan_function(j: int, fn_kw: int, mod: int | None) -> int:
        name = tok(fn_kw + 1) if _is_ident(tok(fn_kw + 1)) else None
        btype = "function_declaration" if name else "function_expression"
        b = fn_kw + 1
        while b < len(toks) and tok(b) != "{":
            b += 1
        return emit(btype, name, j, _match_brace(toks, b), mod)

    while k < len(toks):
        t = tok(k)
        if t == "import" and tok(k + 1) != "(":
            k = emit("import_statement", None, k, _stmt_end(toks, k))
            continue
        if t == "export":
            j = k + 1
            if tok(j) == "default":
                j += 1
            nxt = scan_decl(j, mod=k)
            if nxt is not None:
                k = nxt
                continue
            k = _stmt_end(toks, k) + 1  # export {...} / export default expr
            continue
        nxt = scan_decl(k, mod=None)
        if nxt is not None:
            k = nxt
            continue
        if t == "=>":
            k = _scan_arrow(toks, code, k, out)
            continue
        k += 1
    return out


def _is_ident(t: str | None) -> bool:
    return bool(t) and t[0] in _ID_START and t not in (
        "function", "class", "extends", "implements", "default"
    )


def _scan_arrow(toks, code, k, out) -> int:
    """Emit a bare arrow_function (one not owned by a declaration boundary)."""
    if k == 0:
        return k + 1
    # params: the '(' group or single identifier before '=>'; async included
    if toks[k - 1][0] == ")":
        depth = 0
        s = k - 1
        while s >= 0:
            t = toks[s][0]
            if t == ")":
                depth += 1
            elif t == "(":
                depth -= 1
                if depth == 0:
                    break
            s -= 1
    elif _is_ident(toks[k - 1][0]):
        s = k - 1
    else:
        return k + 1
    if s > 0 and toks[s - 1][0] == "async":
        s -= 1
    if toks[k + 1][0] == "{" if k + 1 < len(toks) else False:
        e = _match_brace(toks, k + 1)
    else:
        e = _stmt_end(toks, k + 1)
        # expression body also ends at ',' or ')' of the enclosing call
        depth = 0
        for j in range(k + 1, len(toks)):
            t = toks[j][0]
            if t in "([{":
                depth += 1
            elif t in ")]}":
                if depth == 0:
                    e = j - 1
                    break
                depth -= 1
            elif t in (",", ";") and depth == 0:
                e = j - 1
                break
    start, end = toks[s][1], toks[e][2]
    out.append(Boundary("arrow_function", None, start, end, code[start:end]))
    return e + 1


# ---------------------------------------------------------------------------
# Vue SFC — block splitter + script delegation.
# ---------------------------------------------------------------------------

import re as _re

_VUE_OPEN_RE = _re.compile(r"<(template|script|style)\b[^>]*>", _re.I)
_VUE_COMMENT_RE = _re.compile(r"<!--.*?-->", _re.S)
_VUE_LANG_RE = _re.compile(r"""\blang\s*=\s*["']?([A-Za-z]+)""", _re.I)


def _extract_vue(code: str) -> list[Boundary]:
    """Vue single-file-component boundaries.

    The reference's tree-sitter-vue grammar emits the top-level blocks as
    boundary nodes — ``template_element`` / ``script_element`` /
    ``style_element`` (`language-node-types.ts:118-125`); embedded
    script source is raw_text to that grammar, so the reference stops at
    the block. Here template/style keep that contract (whole block,
    tags included), and ``<script>`` / ``<script setup>`` goes one level
    deeper: the block's source is delegated to the JS/TS lexer-scanner
    with every span offset by the block start, so line numbers in
    ``boundaries_to_chunks`` land on the real SFC lines. If the inner
    parse yields nothing (or fails), the whole ``script_element`` block
    is emitted — the reference's exact granularity.

    Top-level HTML comments are masked before block scanning so a
    commented-out ``<script>`` cannot open a block; nested
    ``<template #slot>`` elements are depth-counted so the root template
    block closes at its true end.
    """
    # Mask comments positionally (spaces) so offsets stay valid.
    masked = _VUE_COMMENT_RE.sub(lambda m: " " * len(m.group(0)), code)
    out: list[Boundary] = []
    pos = 0
    while m := _VUE_OPEN_RE.search(masked, pos):
        tag = m.group(1).lower()
        open_start, content_start = m.start(), m.end()
        if tag == "template":
            # depth-count nested <template> (v-slot templates)
            depth, scan = 1, content_start
            end = len(masked)
            pat = _re.compile(r"<template\b[^>]*>|</template\s*>", _re.I)
            while depth and (n := pat.search(masked, scan)):
                depth += 1 if not n.group(0).startswith("</") else -1
                scan = n.end()
                if depth == 0:
                    end = n.end()
            block_end = end
            out.append(
                Boundary(
                    "template_element", None, open_start, block_end,
                    code[open_start:block_end],
                )
            )
        else:
            close = _re.search(rf"</{tag}\s*>", masked[content_start:], _re.I)
            content_end = (
                content_start + close.start() if close else len(masked)
            )
            block_end = content_start + close.end() if close else len(masked)
            if tag == "style":
                out.append(
                    Boundary(
                        "style_element", None, open_start, block_end,
                        code[open_start:block_end],
                    )
                )
            else:
                attrs = masked[open_start:content_start]
                lang_m = _VUE_LANG_RE.search(attrs)
                lang = (lang_m.group(1).lower() if lang_m else "js")
                script_lang = "typescript" if lang in ("ts", "tsx") else "javascript"
                body = code[content_start:content_end]
                inner: list[Boundary] = []
                try:
                    inner = _extract_js(body, script_lang)
                except (ValueError, RecursionError):
                    inner = []
                if inner:
                    for b in inner:
                        out.append(
                            Boundary(
                                b.type, b.name,
                                content_start + b.start,
                                content_start + b.end,
                                b.text,
                            )
                        )
                else:
                    out.append(
                        Boundary(
                            "script_element", None, open_start, block_end,
                            code[open_start:block_end],
                        )
                    )
        pos = block_end
    if not out:
        raise ValueError("no Vue SFC blocks found")
    return out


# ---------------------------------------------------------------------------
# Dispatch + chunk adapter.
# ---------------------------------------------------------------------------

_EXT_LANG = {
    ".js": "javascript", ".mjs": "javascript", ".cjs": "javascript",
    ".jsx": "javascript",
    ".ts": "typescript", ".mts": "typescript", ".cts": "typescript",
    ".tsx": "tsx",
    ".py": "python",
    ".vue": "vue",
}


def cst_language_for_ext(path_or_ext: str) -> str | None:
    ext = path_or_ext if path_or_ext.startswith(".") else "." + path_or_ext.rsplit(".", 1)[-1]
    return _EXT_LANG.get(ext.lower())


def extract_boundaries(code: str, language: str) -> list[Boundary]:
    """Outermost boundary nodes for ``language``; raises on unsupported
    languages or unparseable code (callers fall back, as the reference
    does in ``chunkWithFallback``)."""
    if language == "python":
        return _extract_python(code)
    if language in ("javascript", "typescript", "tsx"):
        return _extract_js(code, language)
    if language == "vue":
        return _extract_vue(code)
    raise ValueError(f"no CST parser available for language: {language}")


def boundaries_to_chunks(code: str, boundaries: list[Boundary]) -> list[dict]:
    """Reference ``boundariesToChunks`` (`cst-operations.ts:120-131`) in the
    repo's chunk-dict shape (chunking.CHUNK_SCHEMA columns)."""
    out = []
    for idx, b in enumerate(boundaries):
        out.append(
            {
                "chunk_index": idx,
                "content": b.text,
                "boundary_type": b.type,
                "boundary_level": 0,
                "boundary_title": b.name or "",
                "start_line": code.count("\n", 0, b.start) + 1,
                "end_line": code.count("\n", 0, max(b.start, b.end - 1)) + 1,
            }
        )
    return out


def chunk_cst(
    text: str,
    max_size: int = 650,
    overlap: int = 125,
    language: str | None = None,
    path: str = "",
) -> list[dict]:
    """X12 with the reference's fallback contract: CST boundaries when a
    parser exists and the code parses, else the regex statement scanner
    (X11). Oversized boundary chunks are split like every other strategy."""
    from gistdex_spark.operators.chunking import Section, chunk_code, split_oversized

    lang = language or cst_language_for_ext(path)
    if not lang:
        return chunk_code(text, max_size, overlap)
    try:
        bounds = extract_boundaries(text, lang)
    except (ValueError, SyntaxError, RecursionError):
        return chunk_code(text, max_size, overlap)
    out = []
    idx = 0
    for c in boundaries_to_chunks(text, bounds):
        sec = Section(
            c["boundary_type"], 0, c["boundary_title"],
            c["start_line"], c["end_line"], c["content"],
        )
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
