"""CST-boundary extraction (SURVEY.md §2.7 X12): real tree-sitter when
the runtime + grammar wheel are importable, hand-built parsers otherwise.

The reference parses code with tree-sitter and emits the OUTERMOST
boundary nodes (functions, classes, interfaces, type aliases, imports,
variable declarations), folding an ``export_statement`` /
``decorated_definition`` parent's text into the boundary while keeping the
inner node's type and name (`src/core/chunk/cst-operations.ts:25-110`,
node inventory `src/core/chunk/language-node-types.ts:6-130`). When the
``tree_sitter`` runtime and a language's PyPI grammar wheel import cleanly,
``extract_boundaries`` uses them (``_extract_treesitter``); tree-sitter
wheels are NOT installable in this container, so the module also re-creates
the same contract two ways:

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
# Go / Rust / Java / C / C++ — one C-family lexer + per-language scanners.
#
# The reference parses these through tree-sitter grammars
# (`parser-factory.ts:8-14`, boundary inventory
# `language-node-types.ts:52-101`); names mirror its extractor
# (`language-node-types.ts:154-160`): a boundary carries a name only when
# the tree-sitter node has a `name` field (so Go type/var/const blocks,
# Rust impl/use/let, C declarations stay unnamed, exactly like the
# reference output).
# ---------------------------------------------------------------------------


def _tokenize_c_family(code: str, lang: str) -> list[tuple[str, int, int]]:
    """C-family token stream: comments dropped, strings/chars opaque.

    Per-language lexical quirks handled: Go raw backtick strings and
    significant newlines (emitted as ``<nl>`` tokens — Go statements end
    at line end); Rust nested block comments, raw strings (``r#"..."#``)
    and lifetimes (a lone ``'`` not closing as a char literal); Java text
    blocks; C/C++ preprocessor lines folded into one ``<pp:word>`` token
    with backslash continuations honored."""
    toks: list[tuple[str, int, int]] = []
    i, n = 0, len(code)
    emit_nl = lang == "go"
    while i < n:
        ch = code[i]
        if ch == "\n":
            if emit_nl:
                toks.append(("<nl>", i, i + 1))
            i += 1
            continue
        if ch in " \t\r":
            i += 1
            continue
        if ch == "/" and code[i + 1 : i + 2] == "/":
            j = code.find("\n", i)
            i = n if j < 0 else j
            continue
        if ch == "/" and code[i + 1 : i + 2] == "*":
            if lang == "rust":  # nested block comments
                depth, j = 1, i + 2
                while j < n and depth:
                    if code[j : j + 2] == "/*":
                        depth += 1
                        j += 2
                    elif code[j : j + 2] == "*/":
                        depth -= 1
                        j += 2
                    else:
                        j += 1
                i = j
            else:
                j = code.find("*/", i + 2)
                i = n if j < 0 else j + 2
            continue
        if ch == "#" and lang in ("c", "cpp"):
            j = i
            while True:
                e = code.find("\n", j)
                if e < 0:
                    j = n
                    break
                if code[:e].rstrip("\r").endswith("\\"):
                    j = e + 1
                    continue
                j = e
                break
            m = _re.match(r"#\s*(\w+)", code[i:j])
            toks.append((f"<pp:{m.group(1) if m else ''}>", i, j))
            i = j
            continue
        if ch == "`" and lang == "go":  # raw string, no escapes
            j = code.find("`", i + 1)
            j = n if j < 0 else j + 1
            toks.append(("<str>", i, j))
            i = j
            continue
        if lang == "rust" and ch == "r" and code[i + 1 : i + 2] in ('"', "#"):
            j, hashes = i + 1, 0
            while code[j : j + 1] == "#":
                hashes += 1
                j += 1
            if code[j : j + 1] == '"':
                close = '"' + "#" * hashes
                e = code.find(close, j + 1)
                e = n if e < 0 else e + len(close)
                toks.append(("<str>", i, e))
                i = e
                continue
            # r-prefixed identifier (raw ident) — fall through to ident
        if ch == '"':
            if lang == "java" and code[i : i + 3] == '"""':
                e = code.find('"""', i + 3)
                e = n if e < 0 else e + 3
                toks.append(("<str>", i, e))
                i = e
                continue
            j = i + 1
            while j < n and code[j] != '"':
                j += 2 if code[j] == "\\" else 1
            toks.append(("<str>", i, min(j + 1, n)))
            i = min(j + 1, n)
            continue
        if ch == "'":
            if lang == "rust":
                if code[i + 1 : i + 2] == "\\":
                    j = code.find("'", i + 2)
                    j = n if j < 0 else j + 1
                    toks.append(("<chr>", i, j))
                    i = j
                    continue
                if code[i + 2 : i + 3] == "'":
                    toks.append(("<chr>", i, i + 3))
                    i += 3
                    continue
                toks.append(("'", i, i + 1))  # lifetime tick
                i += 1
                continue
            j = i + 1
            while j < n and code[j] != "'":
                j += 2 if code[j] == "\\" else 1
            toks.append(("<chr>", i, min(j + 1, n)))
            i = min(j + 1, n)
            continue
        if ch in _ID_START:
            j = i + 1
            while j < n and code[j] in _ID_CONT:
                j += 1
            toks.append((code[i:j], i, j))
            i = j
            continue
        toks.append((ch, i, i + 1))
        i += 1
    return toks


def _scan_to(toks, k: int, stops: tuple[str, ...]) -> int | None:
    """First index >= k whose token is in ``stops`` at bracket depth 0;
    stops early on a depth-0 '}' (end of an enclosing block)."""
    depth = 0
    for j in range(k, len(toks)):
        t = toks[j][0]
        if depth == 0 and t in stops:
            return j
        if t in "([{":
            depth += 1
        elif t in ")]}":
            if depth == 0 and t == "}":
                return None
            depth -= 1
    return None


def _extract_go(code: str) -> list[Boundary]:
    toks = _tokenize_c_family(code, "go")
    out: list[Boundary] = []
    k = 0

    def tok(j):
        return toks[j][0] if 0 <= j < len(toks) else None

    def line_end(j: int) -> int:
        """Last non-<nl> token index before the depth-0 end of line."""
        depth, last = 0, j
        while j < len(toks):
            t = toks[j][0]
            if t in "([{":
                depth += 1
            elif t in ")]}":
                if depth == 0:
                    return last
                depth -= 1
            elif t == "<nl>" and depth == 0:
                return last
            if t != "<nl>":
                last = j
            j += 1
        return last

    def body_open(j: int) -> int | None:
        """First '{' at depth 0 before a depth-0 <nl> (same logical line)."""
        depth = 0
        while j < len(toks):
            t = toks[j][0]
            if depth == 0 and t == "{":
                return j
            if depth == 0 and t == "<nl>":
                return None
            if t in "([":
                depth += 1
            elif t in ")]":
                depth -= 1
            j += 1
        return None

    def emit(btype, name, s_tok, e_tok):
        s, e = toks[s_tok][1], toks[e_tok][2]
        out.append(Boundary(btype, name, s, e, code[s:e]))
        return e_tok + 1

    while k < len(toks):
        t = tok(k)
        if t == "func":
            if tok(k + 1) == "(":  # receiver ⇒ method_declaration
                rc = _match_brace(toks, k + 1)
                name = tok(rc + 1) if _is_ident(tok(rc + 1)) else None
                btype, after = "method_declaration", rc + 2
            else:
                name = tok(k + 1) if _is_ident(tok(k + 1)) else None
                btype, after = "function_declaration", k + 2
            b = body_open(after)
            k = emit(btype, name, k, _match_brace(toks, b) if b else line_end(k))
            continue
        if t == "import":
            e = (
                _match_brace(toks, k + 1)
                if tok(k + 1) == "("
                else line_end(k)
            )
            k = emit("import_declaration", None, k, e)
            continue
        if t in ("type", "var", "const"):
            btype = {
                "type": "type_declaration",
                "var": "var_declaration",
                "const": "const_declaration",
            }[t]
            e = (
                _match_brace(toks, k + 1)
                if tok(k + 1) == "("
                else line_end(k)
            )
            k = emit(btype, None, k, e)
            continue
        if t == "{":  # stray block (shouldn't occur at top level) — skip
            k = _match_brace(toks, k) + 1
            continue
        k += 1
    return out


_RUST_ITEM_KEYWORDS = ("fn", "struct", "trait", "impl", "use", "let")


def _extract_rust(code: str) -> list[Boundary]:
    toks = _tokenize_c_family(code, "rust")
    out: list[Boundary] = []
    k = 0
    vis_start: int | None = None  # 'pub' folds into the item span

    def tok(j):
        return toks[j][0] if 0 <= j < len(toks) else None

    def emit(btype, name, s_tok, e_tok):
        s, e = toks[s_tok][1], toks[e_tok][2]
        out.append(Boundary(btype, name, s, e, code[s:e]))
        return e_tok + 1

    while k < len(toks):
        t = tok(k)
        if t == "#" and tok(k + 1) == "[":  # attribute_item: own node, skipped
            k = _match_brace(toks, k + 1) + 1
            continue
        if t == "pub":
            vis_start = k
            k = (
                _match_brace(toks, k + 1) + 1
                if tok(k + 1) == "("  # pub(crate) / pub(super)
                else k + 1
            )
            continue
        if t in ("unsafe", "async", "extern"):
            # item modifiers (`pub unsafe fn`, `async fn`, `extern "C"
            # fn` — the string literal is blanked by the tokenizer): part
            # of the item span, never a reset
            if vis_start is None:
                vis_start = k
            k += 1
            continue
        start = vis_start if vis_start is not None else k
        if t == "const" and tok(k + 1) in ("fn", "unsafe", "extern", "async"):
            if vis_start is None:
                vis_start = k
            k += 1
            continue
        if t in ("const", "static"):
            stop = _scan_to(toks, k + 1, (";",))
            k, vis_start = emit(
                "const_item" if t == "const" else "static_item",
                tok(k + 1) if _is_ident(tok(k + 1)) else None,
                start, stop if stop is not None else len(toks) - 1,
            ), None
            continue
        if t == "enum":
            b = _scan_to(toks, k + 1, ("{",))
            e = _match_brace(toks, b) if b is not None else len(toks) - 1
            k, vis_start = emit(
                "enum_item", tok(k + 1) if _is_ident(tok(k + 1)) else None,
                start, e,
            ), None
            continue
        if t == "type":
            stop = _scan_to(toks, k + 1, (";",))
            k, vis_start = emit(
                "type_item", tok(k + 1) if _is_ident(tok(k + 1)) else None,
                start, stop if stop is not None else len(toks) - 1,
            ), None
            continue
        if t == "fn":
            name = tok(k + 1) if _is_ident(tok(k + 1)) else None
            stop = _scan_to(toks, k + 2, ("{", ";"))
            e = (
                _match_brace(toks, stop)
                if stop is not None and tok(stop) == "{"
                else (stop if stop is not None else len(toks) - 1)
            )
            k, vis_start = emit("function_item", name, start, e), None
            continue
        if t == "struct":
            name = tok(k + 1) if _is_ident(tok(k + 1)) else None
            stop = _scan_to(toks, k + 2, ("{", ";"))
            e = (
                _match_brace(toks, stop)
                if stop is not None and tok(stop) == "{"
                else (stop if stop is not None else len(toks) - 1)
            )
            k, vis_start = emit("struct_item", name, start, e), None
            continue
        if t == "trait":
            b = _scan_to(toks, k + 1, ("{",))
            e = _match_brace(toks, b) if b is not None else len(toks) - 1
            k, vis_start = emit(
                "trait_item", tok(k + 1) if _is_ident(tok(k + 1)) else None,
                start, e,
            ), None
            continue
        if t == "impl":  # no name field in the grammar ⇒ unnamed
            b = _scan_to(toks, k + 1, ("{",))
            e = _match_brace(toks, b) if b is not None else len(toks) - 1
            k, vis_start = emit("impl_item", None, start, e), None
            continue
        if t == "use":
            stop = _scan_to(toks, k + 1, (";",))
            k, vis_start = emit(
                "use_declaration", None, start,
                stop if stop is not None else len(toks) - 1,
            ), None
            continue
        if t == "let":
            stop = _scan_to(toks, k + 1, (";",))
            k = emit(
                "let_declaration", None, k,
                stop if stop is not None else len(toks) - 1,
            )
            continue
        if t == "mod" and _is_ident(tok(k + 1)):
            # mod_item is NOT a boundary: descend into its block, like the
            # reference's traversal through non-boundary nodes.
            b = _scan_to(toks, k + 1, ("{", ";"))
            k = (b + 1) if b is not None else k + 2
            vis_start = None
            continue
        if t == "{":
            k = _match_brace(toks, k) + 1
            continue
        vis_start = None
        k += 1
    return out


_JAVA_MODIFIERS = {
    "public", "protected", "private", "static", "final", "abstract",
    "sealed", "strictfp", "default", "synchronized", "native",
}


def _extract_java(code: str) -> list[Boundary]:
    """Top-level Java boundaries. Classes/interfaces are boundaries, so
    everything inside them (method_declarations included) is suppressed by
    the reference's outermost-only rule — a Java compilation unit can only
    hold type declarations, so top-level scan covers the real inventory."""
    toks = _tokenize_c_family(code, "java")
    out: list[Boundary] = []
    k = 0
    mod_start: int | None = None

    def tok(j):
        return toks[j][0] if 0 <= j < len(toks) else None

    def emit(btype, name, s_tok, e_tok):
        s, e = toks[s_tok][1], toks[e_tok][2]
        out.append(Boundary(btype, name, s, e, code[s:e]))
        return e_tok + 1

    while k < len(toks):
        t = tok(k)
        if t == "@" and _is_ident(tok(k + 1)):  # annotation (modifier-like)
            if mod_start is None:
                mod_start = k
            k += 2
            if tok(k) == "(":
                k = _match_brace(toks, k) + 1
            continue
        if t in _JAVA_MODIFIERS:
            if mod_start is None:
                mod_start = k
            k += 1
            continue
        start = mod_start if mod_start is not None else k
        if t in ("class", "interface"):
            btype = f"{t}_declaration"
            name = tok(k + 1) if _is_ident(tok(k + 1)) else None
            b = _scan_to(toks, k + 1, ("{",))
            e = _match_brace(toks, b) if b is not None else len(toks) - 1
            k, mod_start = emit(btype, name, start, e), None
            continue
        if t == "import":
            stop = _scan_to(toks, k + 1, (";",))
            k, mod_start = emit(
                "import_declaration", None, k,
                stop if stop is not None else len(toks) - 1,
            ), None
            continue
        if t == "{":
            k = _match_brace(toks, k) + 1
            mod_start = None
            continue
        mod_start = None
        k += 1
    return out


def _extract_c(code: str, cpp: bool) -> list[Boundary]:
    toks = _tokenize_c_family(code, "cpp" if cpp else "c")
    out: list[Boundary] = []
    k = 0
    tmpl_start: int | None = None  # template<...> folds into the next item

    def tok(j):
        return toks[j][0] if 0 <= j < len(toks) else None

    def emit(btype, name, s_tok, e_tok):
        s, e = toks[s_tok][1], toks[e_tok][2]
        out.append(Boundary(btype, name, s, e, code[s:e]))
        return e_tok + 1

    while k < len(toks):
        t = tok(k)
        if t.startswith("<pp:"):
            if t == "<pp:include>":
                k = emit("preproc_include", None, k, k)
                continue
            k += 1
            continue
        start = tmpl_start if tmpl_start is not None else k
        if cpp and t == "template" and tok(k + 1) == "<":
            depth, j = 0, k + 1
            while j < len(toks):
                if tok(j) == "<":
                    depth += 1
                elif tok(j) == ">":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            tmpl_start = k
            k = j + 1
            continue
        if t == "typedef":
            stop = _scan_to(toks, k + 1, (";",))
            e = stop if stop is not None else len(toks) - 1
            name = tok(e - 1) if _is_ident(tok(e - 1)) else None
            k, tmpl_start = emit("type_definition", name, start, e), None
            continue
        if t in ("struct", "enum", "union") or (cpp and t == "class"):
            stop = _scan_to(toks, k + 1, ("{", ";"))
            if stop is not None and tok(stop) == "{":
                e = _match_brace(toks, stop)
                if tok(e + 1) == ";":
                    e += 1
                btype = {
                    "struct": "struct_specifier",
                    "enum": "enum_specifier",
                    "union": "union_specifier",
                    "class": "class_specifier",
                }[t]
                name = tok(k + 1) if _is_ident(tok(k + 1)) else None
                k, tmpl_start = emit(btype, name, start, e), None
                continue
            # `struct X y;` — plain declaration, falls through below
        if cpp and t == "namespace":
            b = _scan_to(toks, k + 1, ("{",))
            e = _match_brace(toks, b) if b is not None else len(toks) - 1
            name = tok(k + 1) if _is_ident(tok(k + 1)) else None
            k, tmpl_start = emit("namespace_definition", name, start, e), None
            continue
        if cpp and t == "extern" and tok(k + 1) == "<str>" and tok(k + 2) == "{":
            k = k + 3  # linkage block: descend (not a boundary)
            continue
        if t in ("{", "}", ";"):
            k = (_match_brace(toks, k) + 1) if t == "{" else k + 1
            continue
        # generic statement: function_definition iff a depth-0 '{' follows
        # a completed parameter list with no '=' in between — the suffix
        # tokens modern C++ puts there (noexcept, const, override,
        # -> trailing-return, constructor member-init lists) are all
        # legal; an '=' means brace INITIALIZER (int a[] = {...}), which
        # is skipped. Otherwise the statement is a declaration to ';'.
        depth, j, fn_name, prev = 0, k, None, None
        seen_params, eq_since = False, False
        e = None
        btype = "declaration"
        while j < len(toks):
            tj = tok(j)
            if tj == "(" and depth == 0 and _is_ident(prev) and not seen_params:
                fn_name = prev
            if tj in "([":
                depth += 1
            elif tj in ")]":
                depth -= 1
                if depth == 0 and tj == ")":
                    seen_params, eq_since = True, False
            elif tj == "=" and depth == 0:
                eq_since = True
            elif tj == "{" and depth == 0:
                if seen_params and not eq_since:
                    btype = "function_definition"
                    e = _match_brace(toks, j)
                    break
                j = _match_brace(toks, j)  # brace initializer — skip
            elif tj == ";" and depth == 0:
                e = j
                break
            elif tj == "}" and depth == 0:
                e = j - 1
                break
            prev = tj
            j += 1
        if e is None:
            e = len(toks) - 1
        # tree-sitter's name lives under the declarator, not a name field,
        # so declarations surface unnamed; keep the function name we can
        # recover for usability parity with the regex fallback.
        k, tmpl_start = emit(
            btype, fn_name if btype == "function_definition" else None, start, e
        ), None
    return out


# ---------------------------------------------------------------------------
# Ruby — keyword-balance scanner (def/class/module ... end). Reference node
# inventory `language-node-types.ts:78-84`: method, class, module,
# require/load, assignment.
# ---------------------------------------------------------------------------

# Keywords that open an `end`-terminated block when they START a statement.
_RB_STMT_OPENERS = ("def", "class", "module", "if", "unless", "case",
                    "while", "until", "for", "begin")


def _rb_logical_lines(code: str) -> list[tuple[int, int, list[str]]]:
    """(start_offset, end_offset, word_tokens) per line, with strings and
    comments blanked so keyword counting can't be fooled by them.
    Handles #-comments, =begin/=end blocks, and '\'-free simple quotes."""
    import re as _re

    lines = []
    i, n = 0, len(code)
    in_block_comment = False
    while i < n:
        j = code.find("\n", i)
        if j < 0:
            j = n
        raw = code[i:j]
        stripped = raw.lstrip()
        if in_block_comment:
            words: list[str] = []
            if stripped.startswith("=end"):
                in_block_comment = False
        elif stripped.startswith("=begin"):
            words = []
            in_block_comment = True
        else:
            # blank out quotes, then cut the comment
            blanked, out, q = raw, [], None
            buf = []
            for ch in raw:
                if q:
                    if ch == q:
                        q = None
                    buf.append(" ")
                elif ch in "'\"":
                    q = ch
                    buf.append(" ")
                elif ch == "#":
                    break
                else:
                    buf.append(ch)
            blanked = "".join(buf)
            # numbers, @ivars and $globals must be tokens too — the
            # value-position rule checks ADJACENCY to "=", and dropping
            # `1` from `x = 1 unless y` would make the modifier look
            # value-position. `.word` / `:word` / `word:` keep their
            # sigil so a method call `items.do`, a symbol `:do`, or a
            # hash key `do:` can never read as the block keyword, and
            # `|` is a token so block-arg adjacency is checkable.
            words = _re.findall(
                r"\.[A-Za-z_][A-Za-z0-9_?!]*"
                r"|[A-Za-z_@$][A-Za-z0-9_?!]*:"
                r"|:[A-Za-z_][A-Za-z0-9_?!]*"
                r"|[A-Za-z_@$][A-Za-z0-9_?!]*"
                r"|[0-9][A-Za-z0-9_.]*|=|\|",
                blanked,
            )
        lines.append((i, j, words))
        i = j + 1
    return lines


def _rb_depth_delta(words: list[str]) -> int:
    """Net end-block depth change contributed by one logical line.

    Two Ruby-isms matter beyond statement-initial openers:
    - VALUE-position conditionals (``x = if cond ... end``) open a block
      even though the keyword is mid-line — recognized by the preceding
      ``=`` token (modifier forms like ``x += 1 if y`` never follow a
      bare ``=``);
    - optional loop ``do`` (``while cond do``) belongs to the loop
      keyword and must not count a second opener against the single
      ``end``.
    """
    d = 0
    loop_do_pending = False
    for k, w in enumerate(words):
        if w == "end":
            d -= 1
            loop_do_pending = False
        elif w == "do":
            if loop_do_pending:
                loop_do_pending = False  # the loop's own optional do
            elif k == len(words) - 1 or words[k + 1] == "|":
                # Real block forms only: `xs.each do |x|` / `loop do`
                # put `do` line-final or before the block-arg pipes. A
                # mid-line bare `do` (DSL argument, hash value) would
                # otherwise skew depth for the rest of the file.
                d += 1
        elif w in _RB_STMT_OPENERS:
            if (
                k == 0
                or words[k - 1] == "="
                or w in ("def", "class", "module", "case", "begin")
            ):
                d += 1
                if w in ("while", "until", "for"):
                    loop_do_pending = True
    return d


def _extract_ruby(code: str) -> list[Boundary]:
    lines = _rb_logical_lines(code)
    out: list[Boundary] = []
    depth = 0
    open_start: int | None = None
    open_type = ""
    open_name: str | None = None
    open_depth = 0
    for s, e, words in lines:
        if depth == 0 and open_start is None and words:
            w0 = words[0]
            if w0 in ("def", "class", "module"):
                open_start = s
                open_type = {"def": "method", "class": "class",
                             "module": "module"}[w0]
                open_name = words[1] if len(words) > 1 else None
                open_depth = depth
            elif w0 in ("require", "require_relative", "load"):
                out.append(Boundary(
                    "require" if w0 != "load" else "load", None, s, e,
                    code[s:e]))
            elif len(words) >= 2 and words[1] == "=":
                out.append(Boundary("assignment", words[0], s, e, code[s:e]))
        depth += _rb_depth_delta(words)
        if open_start is not None and depth <= open_depth:
            out.append(Boundary(open_type, open_name, open_start, e,
                                code[open_start:e]))
            open_start = None
    if open_start is not None:
        raise ValueError("unbalanced ruby block")
    return out


# ---------------------------------------------------------------------------
# Bash — function definitions by brace matching, top-level assignments.
# Reference node inventory `language-node-types.ts:113-117`.
# ---------------------------------------------------------------------------


def _bash_blank_heredocs(code: str) -> str:
    """Length-preserving blanking of heredoc bodies (``<<EOF`` ...
    delimiter line): a ``}`` inside a heredoc (JSON/config payloads are
    ubiquitous in real scripts) must not close the enclosing function's
    brace match. ``<<-`` allows tab-indented delimiters; ``<<<``
    here-strings are not heredocs and are left alone."""
    import re as _re

    lines = code.split("\n")
    out, delim, strip_tabs = [], None, False
    opener = _re.compile(r"<<(-?)\s*(['\"]?)(\w+)\2")
    for line in lines:
        if delim is not None:
            probe = line.lstrip("\t") if strip_tabs else line
            ended = probe == delim
            out.append(" " * len(line))
            if ended:
                delim = None
            continue
        m = opener.search(line.replace("<<<", "   "))
        if m:
            delim, strip_tabs = m.group(3), m.group(1) == "-"
        out.append(line)
    return "\n".join(out)


def _extract_bash(code: str) -> list[Boundary]:
    import re as _re

    out: list[Boundary] = []
    # blank heredoc bodies first (their braces/quotes are data), then
    # comments and quoted spans, so brace counting is safe
    code_scan = _bash_blank_heredocs(code)
    buf, q, i, n = [], None, 0, len(code_scan)
    while i < n:
        ch = code_scan[i]
        if q:
            if q != "'" and ch == "\\":
                buf.append("  ")
                i += 2
                continue
            buf.append(ch if ch == "\n" else " ")
            if ch == q:
                buf[-1] = " "
                q = None
        elif ch in "'\"`":
            q = ch
            buf.append(" ")
        elif ch == "#" and (i == 0 or code_scan[i - 1] in " \t\n;"):
            while i < n and code_scan[i] != "\n":
                buf.append(" ")
                i += 1
            continue
        else:
            buf.append(ch)
        i += 1
    blanked = "".join(buf)

    fn_re = _re.compile(
        r"^[ \t]*(?:function[ \t]+(\w+)[ \t]*(?:\(\))?|(\w+)[ \t]*\(\))"
        r"[ \t]*\{", _re.M)
    var_re = _re.compile(r"^[ \t]*(?:export[ \t]+)?(\w+)=", _re.M)
    consumed: list[tuple[int, int]] = []
    for m in fn_re.finditer(blanked):
        depth, j = 0, blanked.find("{", m.start())
        k = j
        while k < n:
            if blanked[k] == "{":
                depth += 1
            elif blanked[k] == "}":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if depth != 0:
            raise ValueError("unbalanced bash function body")
        out.append(Boundary("function_definition", m.group(1) or m.group(2),
                            m.start(), k + 1, code[m.start():k + 1]))
        consumed.append((m.start(), k + 1))
    for m in var_re.finditer(blanked):
        if any(s <= m.start() < e for s, e in consumed):
            continue
        e = blanked.find("\n", m.start())
        e = n if e < 0 else e
        out.append(Boundary("variable_assignment", m.group(1), m.start(), e,
                            code[m.start():e]))
    out.sort(key=lambda b: b.start)
    return out


# ---------------------------------------------------------------------------
# CSS — top-level rules / at-statements by brace matching.
# Reference node inventory `language-node-types.ts:107-112`.
# ---------------------------------------------------------------------------


def _extract_css(code: str) -> list[Boundary]:
    out: list[Boundary] = []
    n = len(code)
    i = 0
    # blank comments and strings
    buf, q = [], None
    j = 0
    while j < n:
        ch = code[j]
        if q:
            buf.append(" ")
            if ch == q:
                q = None
            j += 1
        elif ch in "'\"":
            q = ch
            buf.append(" ")
            j += 1
        elif code[j:j + 2] == "/*":
            k = code.find("*/", j + 2)
            k = n if k < 0 else k + 2
            buf.append(" " * (k - j))
            j = k
        else:
            buf.append(ch)
            j += 1
    blanked = "".join(buf)
    while i < n:
        while i < n and blanked[i] in " \t\n;":
            i += 1
        if i >= n:
            break
        start = i
        # find end: either a top-level `{...}` or a `;` (at-statement)
        while i < n and blanked[i] not in "{;":
            i += 1
        if i >= n or blanked[i] == ";":
            head = blanked[start:i].strip()
            btype = "import_statement" if head.startswith("@import") else "at_statement"
            out.append(Boundary(btype, None, start, min(i + 1, n),
                                code[start:min(i + 1, n)]))
            i += 1
            continue
        depth = 0
        k = i
        while k < n:
            if blanked[k] == "{":
                depth += 1
            elif blanked[k] == "}":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if depth != 0:
            raise ValueError("unbalanced css block")
        head = blanked[start:i].strip()
        if head.startswith("@media"):
            btype = "media_statement"
        elif head.startswith("@keyframes"):
            btype = "keyframes_statement"
        else:
            btype = "rule_set"
        out.append(Boundary(btype, head or None, start, k + 1,
                            code[start:k + 1]))
        i = k + 1
    return out


# ---------------------------------------------------------------------------
# HTML — top-level elements by tag-depth tracking.
# Reference node inventory `language-node-types.ts:102-106`: element,
# script_element, style_element.
# ---------------------------------------------------------------------------

_HTML_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


def _extract_html(code: str) -> list[Boundary]:
    import re as _re

    tag_re = _re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>")
    out: list[Boundary] = []
    i, n = 0, len(code)
    stack: list[tuple[str, int]] = []  # (tag, start offset) of open elements
    while i < n:
        lt = code.find("<", i)
        if lt < 0:
            break
        if code.startswith("<!--", lt):
            end = code.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if code.startswith("<!", lt):  # doctype / declarations
            gt = code.find(">", lt)
            i = n if gt < 0 else gt + 1
            continue
        m = tag_re.match(code, lt)
        if not m:
            i = lt + 1
            continue
        closing, tag, _attrs, selfclose = m.groups()
        tag = tag.lower()
        i = m.end()
        if closing:
            # pop to the matching open tag (tolerates unclosed inline tags)
            for k in range(len(stack) - 1, -1, -1):
                if stack[k][0] == tag:
                    top_tag, top_start = stack[k]
                    del stack[k:]
                    if not stack:  # a depth-0 element just closed
                        btype = (
                            "script_element" if top_tag == "script"
                            else "style_element" if top_tag == "style"
                            else "element"
                        )
                        out.append(Boundary(
                            btype, top_tag, top_start, m.end(),
                            code[top_start:m.end()]))
                    break
            continue
        if selfclose or tag in _HTML_VOID:
            if not stack:
                out.append(Boundary("element", tag, lt, m.end(),
                                    code[lt:m.end()]))
            continue
        if tag in ("script", "style"):
            # raw-text elements: no tag parsing until the literal closer
            close = code.lower().find(f"</{tag}", m.end())
            if close < 0:
                raise ValueError(f"unclosed <{tag}> element")
            gt = code.find(">", close)
            end = n if gt < 0 else gt + 1
            if not stack:
                out.append(Boundary(
                    "script_element" if tag == "script" else "style_element",
                    tag, lt, end, code[lt:end]))
            i = end
            continue
        stack.append((tag, lt))
    if stack:
        # HTML5 end tags are OPTIONAL for many elements (p, li, td, ...)
        # and real pages routinely leave the last element unclosed;
        # tree-sitter's html grammar error-recovers the same way. Close
        # whatever is still open at EOF: the outermost open element
        # becomes a boundary spanning to the end of the document.
        top_tag, top_start = stack[0]
        btype = (
            "script_element" if top_tag == "script"
            else "style_element" if top_tag == "style"
            else "element"
        )
        out.append(Boundary(btype, top_tag, top_start, n, code[top_start:n]))
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
    ".go": "go",
    ".rs": "rust",
    ".java": "java",
    ".c": "c", ".h": "c",
    ".cpp": "cpp", ".cc": "cpp", ".cxx": "cpp", ".hpp": "cpp", ".hh": "cpp",
    ".rb": "ruby",
    ".sh": "bash", ".bash": "bash",
    ".css": "css",
    ".html": "html", ".htm": "html",
}


def cst_language_for_ext(path_or_ext: str) -> str | None:
    ext = path_or_ext if path_or_ext.startswith(".") else "." + path_or_ext.rsplit(".", 1)[-1]
    return _EXT_LANG.get(ext.lower())


# ---------------------------------------------------------------------------
# Optional tree-sitter dispatch: when the real runtime AND a grammar wheel
# for the language are importable, parse with them (the reference's primary
# path, `parser-factory.ts`); otherwise the hand-built scanners below carry
# the same contract. Same optional-import pattern as multimodal's PIL
# dispatch (operators/multimodal.py).
# ---------------------------------------------------------------------------

# Boundary node types per language — verbatim from the reference inventory
# (`src/core/chunk/language-node-types.ts:6-130`).
_TS_BOUNDARY_TYPES: dict[str, frozenset[str]] = {
    "javascript": frozenset({
        "function_declaration", "function_expression", "arrow_function",
        "class_declaration", "method_definition", "import_statement",
        "variable_declaration", "lexical_declaration",
    }),
    "typescript": frozenset({
        "function_declaration", "function_expression", "arrow_function",
        "class_declaration", "method_definition", "interface_declaration",
        "type_alias_declaration", "import_statement",
        "variable_declaration", "lexical_declaration",
    }),
    "tsx": frozenset({
        "function_declaration", "function_expression", "arrow_function",
        "class_declaration", "method_definition", "interface_declaration",
        "type_alias_declaration", "import_statement",
        "variable_declaration", "lexical_declaration",
        "jsx_element", "jsx_self_closing_element", "jsx_fragment",
    }),
    "python": frozenset({
        "function_definition", "class_definition", "import_statement",
        "import_from_statement", "assignment",
    }),
    "go": frozenset({
        "function_declaration", "method_declaration", "type_declaration",
        "import_declaration", "var_declaration", "const_declaration",
        "short_var_declaration",
    }),
    "rust": frozenset({
        "function_item", "struct_item", "impl_item", "trait_item",
        "use_declaration", "let_declaration",
    }),
    "java": frozenset({
        "method_declaration", "class_declaration", "interface_declaration",
        "import_declaration", "local_variable_declaration",
    }),
    "ruby": frozenset({"method", "class", "module", "require", "load",
                       "assignment"}),
    "c": frozenset({
        "function_definition", "struct_specifier", "enum_specifier",
        "type_definition", "preproc_include", "declaration",
    }),
    "cpp": frozenset({
        "function_definition", "class_specifier", "struct_specifier",
        "namespace_definition", "template_declaration", "preproc_include",
        "declaration",
    }),
    "html": frozenset({"element", "script_element", "style_element"}),
    "css": frozenset({"rule_set", "media_statement", "keyframes_statement",
                      "import_statement"}),
    "bash": frozenset({"function_definition", "command",
                       "variable_assignment"}),
}

# PyPI grammar wheels: module name (+ factory attr where the wheel exports
# more than one grammar, e.g. tree-sitter-typescript).
_TS_GRAMMAR_MODULES: dict[str, tuple[str, str]] = {
    "javascript": ("tree_sitter_javascript", "language"),
    "typescript": ("tree_sitter_typescript", "language_typescript"),
    "tsx": ("tree_sitter_typescript", "language_tsx"),
    "python": ("tree_sitter_python", "language"),
    "go": ("tree_sitter_go", "language"),
    "rust": ("tree_sitter_rust", "language"),
    "java": ("tree_sitter_java", "language"),
    "ruby": ("tree_sitter_ruby", "language"),
    "c": ("tree_sitter_c", "language"),
    "cpp": ("tree_sitter_cpp", "language"),
    "bash": ("tree_sitter_bash", "language"),
    "css": ("tree_sitter_css", "language"),
    "html": ("tree_sitter_html", "language"),
}


def _treesitter_parser(language: str):
    """A real tree-sitter Parser for ``language``, or None when either the
    runtime or the language's grammar wheel is absent/broken — callers fall
    back to the shipped scanners, never fail. Cached per language."""
    if language in _TS_PARSER_CACHE:
        return _TS_PARSER_CACHE[language]
    parser = None
    spec = _TS_GRAMMAR_MODULES.get(language)
    if spec is not None:
        try:
            import importlib  # noqa: PLC0415

            from tree_sitter import Language, Parser  # noqa: PLC0415

            mod = importlib.import_module(spec[0])
            parser = Parser(Language(getattr(mod, spec[1])()))
        except Exception:  # noqa: BLE001 — absent/ABI-mismatched wheel
            parser = None
    _TS_PARSER_CACHE[language] = parser
    return parser


_TS_PARSER_CACHE: dict[str, object] = {}


def _extract_treesitter(code: str, language: str, parser) -> list[Boundary]:
    """OUTERMOST inventory-listed nodes from a real tree-sitter parse —
    the reference's traversal (`cst-operations.ts:25-110`): stop descent at
    a boundary, fold an export/decorated parent's span in, keep the inner
    node's type and name."""
    raw = code.encode("utf-8")
    tree = parser.parse(raw)
    if tree.root_node.has_error:
        raise ValueError(f"tree-sitter parse error in {language} source")
    types = _TS_BOUNDARY_TYPES[language]
    wrappers = {"export_statement", "decorated_definition"}

    # Incremental byte->char offset mapping: boundary endpoints arrive in
    # document order, so decoding only the delta since the last query makes
    # the whole extraction O(file_size) instead of O(boundaries * size)
    # (the naive len(raw[:off].decode()) per call re-decodes the prefix
    # every time). tree-sitter byte offsets land on codepoint boundaries
    # of the valid UTF-8 we encoded, so delta decodes are exact; an
    # out-of-order query (shouldn't happen) falls back to a full decode.
    frontier = [0, 0]  # [byte_pos, char_pos]

    def char_at(byte_off: int) -> int:
        # errors='replace' on the delta too: offsets should land on
        # codepoint boundaries of the UTF-8 we encoded, but this mapper
        # must never raise (the old full-decode path degraded gracefully
        # and the incremental rewrite keeps that contract).
        if byte_off >= frontier[0]:
            frontier[1] += len(
                raw[frontier[0]:byte_off].decode("utf-8", errors="replace")
            )
            frontier[0] = byte_off
            return frontier[1]
        return len(raw[:byte_off].decode("utf-8", errors="replace"))

    def name_of(node) -> str | None:
        for field in ("name", "declarator"):
            child = node.child_by_field_name(field)
            if child is None:
                continue
            inner = child.child_by_field_name("name")
            target = inner if inner is not None else child
            if target.type.endswith("identifier") or target.type in (
                "identifier", "word", "constant", "type_identifier"
            ):
                return target.text.decode("utf-8", errors="replace")
        return None

    out: list[Boundary] = []

    def walk(node, span_node=None) -> None:
        if node.type in wrappers:
            # Fold the wrapper's span but emit the inner boundary's
            # type/name — the reference's export/decorator rule.
            for child in node.children:
                if child.is_named and child.type in types:
                    emit(child, node)
                    return
        if node.type in types:
            emit(node, span_node)
            return
        for child in node.children:
            walk(child)

    def emit(node, span_node) -> None:
        span = span_node if span_node is not None else node
        s, e = char_at(span.start_byte), char_at(span.end_byte)
        out.append(Boundary(node.type, name_of(node), s, e, code[s:e]))

    for child in tree.root_node.children:
        walk(child)
    return out


def extract_boundaries(code: str, language: str) -> list[Boundary]:
    """Outermost boundary nodes for ``language``; raises on unsupported
    languages or unparseable code (callers fall back, as the reference
    does in ``chunkWithFallback``). Parses with the REAL tree-sitter
    grammar when the runtime + wheel are importable on this cluster; the
    hand-built scanners below are the portable fallback."""
    ts = _treesitter_parser(language)
    if ts is not None:
        try:
            return _extract_treesitter(code, language, ts)
        except ValueError:
            pass  # grammar rejected the code — let the scanner decide
    if language == "python":
        return _extract_python(code)
    if language in ("javascript", "typescript", "tsx"):
        return _extract_js(code, language)
    if language == "vue":
        return _extract_vue(code)
    if language == "go":
        return _extract_go(code)
    if language == "rust":
        return _extract_rust(code)
    if language == "java":
        return _extract_java(code)
    if language in ("c", "cpp"):
        return _extract_c(code, cpp=language == "cpp")
    if language == "ruby":
        return _extract_ruby(code)
    if language == "bash":
        return _extract_bash(code)
    if language == "css":
        return _extract_css(code)
    if language == "html":
        return _extract_html(code)
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
    if not bounds and text.strip():
        # A parser that finds NOTHING in non-empty code (e.g. a Java file
        # whose only top-level item is an enum the inventory doesn't
        # list) must fall back like a failed parse — otherwise the file
        # silently contributes zero chunks and vanishes from the index.
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
