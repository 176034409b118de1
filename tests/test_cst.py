"""CST boundary extraction (X12) — cases mirror the reference's
`src/core/chunk/cst-operations.test.ts`, `cst-operations-python.test.ts`,
and the `tests/features/test-cst.ts` fixture expectations."""

from __future__ import annotations

import textwrap

import pytest

from gistdex_spark.operators.cst import (
    boundaries_to_chunks,
    chunk_cst,
    cst_language_for_ext,
    extract_boundaries,
)


def _by_type(bounds, t):
    return [b for b in bounds if b.type == t]


# --- JavaScript (cst-operations.test.ts "JavaScript node detection") -------


def test_js_function_declaration():
    code = "function add(a, b) { return a + b; }"
    r = extract_boundaries(code, "javascript")
    assert len(r) == 1
    assert r[0].type == "function_declaration"
    assert r[0].name == "add"
    assert r[0].text == code


def test_js_arrow_within_lexical_declaration():
    code = "const add = (a, b) => a + b;"
    r = extract_boundaries(code, "javascript")
    lex = _by_type(r, "lexical_declaration")
    assert len(lex) == 1
    assert lex[0].text == code
    # arrow is inside the declaration boundary → not emitted separately
    assert not _by_type(r, "arrow_function")


def test_js_class_declaration_methods_suppressed():
    code = "class Calculator { constructor() {} add(a, b) { return a + b; } }"
    r = extract_boundaries(code, "javascript")
    cls = _by_type(r, "class_declaration")
    assert len(cls) == 1
    assert cls[0].name == "Calculator"
    assert cls[0].text == code
    assert not _by_type(r, "method_definition")


def test_js_import_statements():
    code = 'import { something } from "module";\nimport React from "react";'
    r = extract_boundaries(code, "javascript")
    assert len(_by_type(r, "import_statement")) == 2


def test_js_variable_declarations():
    code = "const x = 10;\nlet y = 20;\nvar z = 30;"
    r = extract_boundaries(code, "javascript")
    assert len(_by_type(r, "lexical_declaration")) == 2
    assert len(_by_type(r, "variable_declaration")) == 1


def test_js_function_expression_within_lexical_declaration():
    code = "const fn = function namedFunc() { return 42; };"
    r = extract_boundaries(code, "javascript")
    lex = _by_type(r, "lexical_declaration")
    assert len(lex) == 1
    assert lex[0].text == code


def test_js_async_function():
    code = "async function fetchData() { await fetch('/api'); }"
    r = extract_boundaries(code, "javascript")
    fn = _by_type(r, "function_declaration")
    assert len(fn) == 1
    assert fn[0].name == "fetchData"
    assert fn[0].text == code


def test_js_nested_structures_single_class_boundary():
    code = textwrap.dedent(
        """
        class MyComponent {
          constructor() {
            this.state = {};
          }

          render() {
            const handleClick = () => {
              console.log("clicked");
            };

            return null;
          }
        }"""
    )
    r = extract_boundaries(code, "javascript")
    assert len(r) == 1
    assert r[0].type == "class_declaration"
    assert r[0].name == "MyComponent"


def test_js_bare_arrow_function_emitted():
    code = 'app.get("/x", (req, res) => { res.send(1); });'
    r = extract_boundaries(code, "javascript")
    arrows = _by_type(r, "arrow_function")
    assert len(arrows) == 1
    assert arrows[0].text == "(req, res) => { res.send(1); }"


def test_js_comments_and_strings_not_parsed():
    code = (
        "// function fake() {}\n"
        '/* class Fake {} */\n'
        'const s = "function alsoFake() {}";\n'
        "function real() { return `class X {}`; }\n"
    )
    r = extract_boundaries(code, "javascript")
    fns = _by_type(r, "function_declaration")
    assert [f.name for f in fns] == ["real"]
    assert len(_by_type(r, "class_declaration")) == 0


# --- TypeScript ------------------------------------------------------------


def test_ts_interface_and_type_alias():
    code = (
        "interface Shape { area(): number; }\n"
        "type Point = { x: number; y: number };\n"
    )
    r = extract_boundaries(code, "typescript")
    iface = _by_type(r, "interface_declaration")
    talias = _by_type(r, "type_alias_declaration")
    assert len(iface) == 1 and iface[0].name == "Shape"
    assert len(talias) == 1 and talias[0].name == "Point"


def test_ts_export_modifier_included_in_text():
    code = "export function testFunction() {\n  console.log(1);\n}"
    r = extract_boundaries(code, "typescript")
    assert len(r) == 1
    b = r[0]
    # type/name come from the declaration, text includes the modifier
    assert b.type == "function_declaration"
    assert b.name == "testFunction"
    assert b.text.startswith("export function")


def test_ts_fixture_test_cst():
    """The reference's tests/features/test-cst.ts fixture end-to-end."""
    code = textwrap.dedent(
        """
        // Test file for CST parsing

        export function testFunction() {
          console.log("Hello, World!");
        }

        export const arrowFunction = () => {
          return "Arrow function";
        };

        export async function asyncFunction() {
          await new Promise((resolve) => setTimeout(resolve, 100));
          return "Async function";
        }

        export const asyncArrowFunction = async () => {
          await new Promise((resolve) => setTimeout(resolve, 100));
          return "Async arrow function";
        };

        class TestClass {
          method() {
            return "Method";
          }

          async asyncMethod() {
            return "Async method";
          }
        }

        export default TestClass;
        """
    )
    r = extract_boundaries(code, "typescript")
    fns = _by_type(r, "function_declaration")
    assert sorted(f.name for f in fns) == ["asyncFunction", "testFunction"]
    assert all(f.text.startswith("export ") for f in fns)
    lex = _by_type(r, "lexical_declaration")
    assert len(lex) == 2  # the two exported arrow-function consts
    assert all(x.text.startswith("export const") for x in lex)
    cls = _by_type(r, "class_declaration")
    assert len(cls) == 1 and cls[0].name == "TestClass"
    assert not cls[0].text.startswith("export")
    # `export default TestClass;` is no boundary node
    assert len(r) == 5


# --- Python (cst-operations-python.test.ts) --------------------------------


def test_py_function_definition():
    code = "def add(a, b):\n    return a + b"
    r = extract_boundaries(code, "python")
    fn = _by_type(r, "function_definition")
    assert len(fn) == 1 and fn[0].name == "add"
    assert fn[0].text == code


def test_py_class_methods_suppressed():
    code = textwrap.dedent(
        """\
        class Calculator:
            def __init__(self):
                self.value = 0

            def add(self, x):
                self.value += x"""
    )
    r = extract_boundaries(code, "python")
    cls = _by_type(r, "class_definition")
    assert len(cls) == 1 and cls[0].name == "Calculator"
    assert not _by_type(r, "function_definition")


def test_py_async_function():
    code = 'async def fetch_data():\n    await asyncio.sleep(1)\n    return "data"'
    r = extract_boundaries(code, "python")
    fn = _by_type(r, "function_definition")
    assert len(fn) == 1 and fn[0].name == "fetch_data"


def test_py_imports():
    code = "import os\nfrom typing import List\nimport asyncio as aio"
    r = extract_boundaries(code, "python")
    assert len(_by_type(r, "import_statement")) == 2
    assert len(_by_type(r, "import_from_statement")) == 1


def test_py_decorated_definition_modifier():
    code = "@cache\n@trace\ndef slow(x):\n    return x * 2"
    r = extract_boundaries(code, "python")
    fn = _by_type(r, "function_definition")
    assert len(fn) == 1
    assert fn[0].name == "slow"  # type/name from the inner definition
    assert fn[0].text.startswith("@cache")  # span includes the decorators


def test_py_assignment_and_nested_in_if():
    code = textwrap.dedent(
        """\
        X = 1
        if True:
            def inner():
                pass
        """
    )
    r = extract_boundaries(code, "python")
    assert [b.name for b in _by_type(r, "assignment")] == ["X"]
    # a def inside a non-boundary compound statement IS a boundary
    assert [b.name for b in _by_type(r, "function_definition")] == ["inner"]


# --- chunk adapter + fallback (cst-operations.ts chunkWith*) ---------------


def test_chunk_cst_two_functions():
    code = "function first() {}\nfunction second() {}"
    chunks = chunk_cst(code, language="javascript")
    assert len(chunks) == 2
    assert chunks[0]["boundary_title"] == "first"
    assert chunks[1]["boundary_title"] == "second"


def test_chunk_cst_falls_back_on_unsupported_language():
    code = "<template><div></div></template>"
    chunks = chunk_cst(code, path="test.vue")
    assert chunks  # regex fallback produced output
    assert all(c["boundary_type"] != "function_declaration" for c in chunks)


def test_chunk_cst_falls_back_on_syntax_error():
    code = "def broken(:\n  pass"
    chunks = chunk_cst(code, language="python")
    assert chunks  # fell back to the statement scanner instead of raising


def test_boundaries_to_chunks_line_numbers():
    code = "import os\n\n\ndef f():\n    return 1\n"
    bounds = extract_boundaries(code, "python")
    chunks = boundaries_to_chunks(code, bounds)
    imp = next(c for c in chunks if c["boundary_type"] == "import_statement")
    fn = next(c for c in chunks if c["boundary_type"] == "function_definition")
    assert (imp["start_line"], imp["end_line"]) == (1, 1)
    assert (fn["start_line"], fn["end_line"]) == (4, 5)


def test_language_for_ext():
    assert cst_language_for_ext("a/b/mod.ts") == "typescript"
    assert cst_language_for_ext(".tsx") == "tsx"
    assert cst_language_for_ext("x.py") == "python"
    assert cst_language_for_ext("App.vue") == "vue"
    assert cst_language_for_ext("x.go") == "go"
    assert cst_language_for_ext("x.rb") == "ruby"
    assert cst_language_for_ext("x.svelte") is None


# Mirror of the reference fixture `tests/features/test-vue.vue` — same block
# layout and script members (identifiers shortened, content paraphrased).
VUE_SFC = """<template>
  <div class="hello-world">
    <h1>{{ title }}</h1>
    <p>Count: {{ count }}</p>
    <button @click="increment">Increment</button>
  </div>
</template>

<script setup lang="ts">
import { computed, ref } from "vue";

interface Item {
  id: number;
  name: string;
}

const count = ref(0);

const increment = () => {
  count.value++;
};
</script>

<style scoped>
.hello-world {
  padding: 20px;
}
</style>"""


def test_vue_sfc_blocks_and_script_delegation():
    """Reference `cst-operations-vue.test.ts` ("should parse Vue SFC
    structure"): boundaries must cover the template, script, and style
    blocks. Template/style keep the tree-sitter-vue block granularity
    (`language-node-types.ts:118-125`); script content delegates to the
    TS scanner (lang="ts" attribute), so its members appear individually."""
    bounds = extract_boundaries(VUE_SFC, "vue")
    types = [b.type for b in bounds]
    assert types[0] == "template_element"
    assert bounds[0].text.startswith("<template>")
    assert bounds[0].text.rstrip().endswith("</template>")
    assert "style_element" in types
    style = _by_type(bounds, "style_element")[0]
    assert style.text.startswith("<style scoped>")
    # delegated script members with reference node-type names
    assert "import_statement" in types
    assert "interface_declaration" in types
    iface = _by_type(bounds, "interface_declaration")[0]
    assert iface.name == "Item"
    assert len(_by_type(bounds, "lexical_declaration")) == 2


def test_vue_script_line_numbers_offset_by_block_start():
    """Spans are offset by the script block's start so SFC line numbers
    are real file lines, not script-local ones."""
    chunks = boundaries_to_chunks(VUE_SFC, extract_boundaries(VUE_SFC, "vue"))
    imp = next(c for c in chunks if c["boundary_type"] == "import_statement")
    assert imp["start_line"] == 10  # line of `import { computed, ref }`
    iface = next(
        c for c in chunks if c["boundary_type"] == "interface_declaration"
    )
    assert (iface["start_line"], iface["end_line"]) == (12, 15)


def test_vue_nested_template_depth_counted():
    code = (
        "<template>\n  <template #header>\n    <h1>t</h1>\n  </template>\n"
        "</template>\n<style>\n.a {}\n</style>"
    )
    bounds = extract_boundaries(code, "vue")
    tpl = _by_type(bounds, "template_element")[0]
    # root template closes at ITS closing tag, not the inner slot's
    assert tpl.text.count("<template") == 2
    assert tpl.text.rstrip().endswith("</template>")
    assert "style_element" in [b.type for b in bounds]


def test_vue_commented_out_block_ignored():
    code = (
        "<!-- <script>const hidden = 1;</script> -->\n"
        "<template>\n  <div/>\n</template>\n"
    )
    bounds = extract_boundaries(code, "vue")
    assert [b.type for b in bounds] == ["template_element"]


def test_vue_empty_or_unparseable_script_falls_back_to_block():
    code = "<template>\n<div/>\n</template>\n<script>\n   \n</script>\n"
    bounds = extract_boundaries(code, "vue")
    assert "script_element" in [b.type for b in bounds]
    script = _by_type(bounds, "script_element")[0]
    assert script.text.startswith("<script>")


def test_vue_chunk_cst_end_to_end():
    chunks = chunk_cst(VUE_SFC, language="vue")
    types = {c["boundary_type"] for c in chunks}
    assert {"template_element", "style_element", "import_statement"} <= types


def test_chunk_documents_cst_strategy(spark):
    """Distributed CST chunking: per-row language routing via mapInPandas."""
    from gistdex_spark.operators.chunking import chunk_documents

    rows = [
        (1, "def a():\n    return 1\n\ndef b():\n    return 2", "python"),
        (2, "export function f() { return 1; }\nclass C {}", "typescript"),
        (3, "plain prose with no parser", "en"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = chunk_documents(
        df, id_col="doc_id", content_col="text", strategy="cst",
        size=650, overlap=125, lang_col="lang",
    )
    got = {
        (r.source_id, r.boundary_type, r.boundary_title)
        for r in out.collect()
    }
    assert ("1", "function_definition", "a") in got
    assert ("1", "function_definition", "b") in got
    assert ("2", "function_declaration", "f") in got
    assert ("2", "class_declaration", "C") in got
    # unsupported language fell back to the regex statement scanner
    assert any(sid == "3" for sid, _, _ in got)


# ---------------------------------------------------------------------------
# Go / Rust / Java / C / C++ (reference: cst-operations-go.test.ts,
# cst-operations-additional.test.ts).
# ---------------------------------------------------------------------------


def _types(bs):
    return [b.type for b in bs]


def test_go_function_and_method():
    from gistdex_spark.operators.cst import extract_boundaries

    bs = extract_boundaries(
        "func add(a, b int) int {\n    return a + b\n}\n", "go"
    )
    f = next(b for b in bs if b.type == "function_declaration")
    assert f.name == "add" and f.text.endswith("}")

    bs = extract_boundaries(
        "func (c *Calculator) Add(a, b int) int {\n    return a + b\n}\n", "go"
    )
    m = next(b for b in bs if b.type == "method_declaration")
    assert m.name == "Add"


def test_go_type_import_var_const():
    from gistdex_spark.operators.cst import extract_boundaries

    code = (
        'import (\n    "fmt"\n    "net/http"\n)\n\n'
        "type Calculator struct {\n    value int\n}\n\n"
        "var x int = 10\n"
        "const PI = 3.14\n"
    )
    bs = extract_boundaries(code, "go")
    types = _types(bs)
    assert "import_declaration" in types
    t = next(b for b in bs if b.type == "type_declaration")
    # type_declaration has no tree-sitter name field — unnamed, whole block
    assert t.name is None and t.text.rstrip().endswith("}")
    assert "var_declaration" in types and "const_declaration" in types
    v = next(b for b in bs if b.type == "var_declaration")
    assert v.text == "var x int = 10"


def test_go_body_brace_in_string_and_raw_string():
    from gistdex_spark.operators.cst import extract_boundaries

    code = 'func f() string {\n    return "}" + `}\n}` \n}\nvar y = 1\n'
    bs = extract_boundaries(code, "go")
    f = next(b for b in bs if b.type == "function_declaration")
    assert f.text.rstrip().endswith("}") and f.text.count("func") == 1
    assert any(b.type == "var_declaration" for b in bs)


def test_rust_items():
    from gistdex_spark.operators.cst import extract_boundaries

    code = (
        "use std::fmt;\n\n"
        "#[derive(Debug)]\n"
        "pub struct Point { x: i32, y: i32 }\n\n"
        "struct Unit;\n\n"
        "pub fn norm(p: &Point) -> f64 {\n    ((p.x * p.x) as f64).sqrt()\n}\n\n"
        "impl fmt::Display for Point {\n"
        "    fn fmt(&self, f: &mut fmt::Formatter) -> fmt::Result { write!(f, \"p\") }\n"
        "}\n\n"
        "trait Shape {\n    fn area(&self) -> f64;\n}\n"
    )
    bs = extract_boundaries(code, "rust")
    types = _types(bs)
    assert "use_declaration" in types
    s = next(b for b in bs if b.type == "struct_item")
    assert s.name == "Point" and s.text.startswith("pub struct")
    assert any(b.type == "struct_item" and b.name == "Unit" for b in bs)
    f = next(b for b in bs if b.type == "function_item")
    assert f.name == "norm" and f.text.startswith("pub fn")
    imp = next(b for b in bs if b.type == "impl_item")
    # impl_item has no name field; inner fn suppressed (outermost only)
    assert imp.name is None and "fn fmt" in imp.text
    assert sum(1 for b in bs if b.type == "function_item") == 1
    assert any(b.type == "trait_item" and b.name == "Shape" for b in bs)


def test_rust_lifetimes_and_raw_strings_lex():
    from gistdex_spark.operators.cst import extract_boundaries

    code = (
        "fn get<'a>(s: &'a str) -> &'a str {\n"
        "    let re = r#\"}\"#;\n    s\n}\n"
        "fn second() {}\n"
    )
    bs = extract_boundaries(code, "rust")
    names = [b.name for b in bs if b.type == "function_item"]
    assert names == ["get", "second"]


def test_java_class_suppresses_methods():
    from gistdex_spark.operators.cst import extract_boundaries

    code = (
        "import java.util.List;\n\n"
        "public class Calculator {\n"
        "    public int add(int a, int b) {\n        return a + b;\n    }\n"
        "}\n"
    )
    bs = extract_boundaries(code, "java")
    c = next(b for b in bs if b.type == "class_declaration")
    assert c.name == "Calculator" and c.text.startswith("public class")
    # reference: methods inside the class are NOT separate boundaries
    assert not any(b.type == "method_declaration" for b in bs)
    assert any(b.type == "import_declaration" for b in bs)


def test_java_interface_and_annotation_modifier():
    from gistdex_spark.operators.cst import extract_boundaries

    code = (
        "@FunctionalInterface\n"
        "public interface Op {\n    int apply(int a);\n}\n"
    )
    bs = extract_boundaries(code, "java")
    i = next(b for b in bs if b.type == "interface_declaration")
    assert i.name == "Op" and i.text.startswith("@FunctionalInterface")


def test_c_function_struct_include():
    from gistdex_spark.operators.cst import extract_boundaries

    code = (
        "#include <stdio.h>\n\n"
        "struct Pair { int a; int b; };\n\n"
        "int add(int a, int b) {\n    return a + b;\n}\n\n"
        "static const int LIMIT = 10;\n"
    )
    bs = extract_boundaries(code, "c")
    assert any(b.type == "preproc_include" for b in bs)
    s = next(b for b in bs if b.type == "struct_specifier")
    assert s.name == "Pair" and s.text.endswith(";")
    f = next(b for b in bs if b.type == "function_definition")
    assert f.name == "add" and f.text.endswith("}")
    d = next(b for b in bs if b.type == "declaration")
    assert "LIMIT" in d.text


def test_cpp_class_namespace_template():
    from gistdex_spark.operators.cst import extract_boundaries

    code = (
        "namespace math {\n"
        "    int helper() { return 1; }\n"
        "}\n\n"
        "class Calculator {\npublic:\n    int add(int a, int b);\n};\n\n"
        "template <typename T>\nT max3(T a, T b) { return a > b ? a : b; }\n"
    )
    bs = extract_boundaries(code, "cpp")
    ns = next(b for b in bs if b.type == "namespace_definition")
    assert ns.name == "math" and "helper" in ns.text
    # namespace is the outermost boundary — helper() suppressed
    assert not any(
        b.type == "function_definition" and b.name == "helper" for b in bs
    )
    c = next(b for b in bs if b.type == "class_specifier")
    assert c.name == "Calculator" and c.text.endswith(";")
    t = next(b for b in bs if b.name == "max3")
    assert t.type == "function_definition" and t.text.startswith("template")


def test_c_family_ext_dispatch():
    from gistdex_spark.operators.cst import cst_language_for_ext

    assert cst_language_for_ext(".go") == "go"
    assert cst_language_for_ext("main.rs") == "rust"
    assert cst_language_for_ext("A.java") == "java"
    assert cst_language_for_ext(".h") == "c"
    assert cst_language_for_ext("x.hpp") == "cpp"


def test_c_family_chunk_cst_end_to_end():
    from gistdex_spark.operators.cst import chunk_cst

    chunks = chunk_cst(
        "func a() {\n}\n\nfunc b() {\n}\n", language="go", path="x.go"
    )
    assert [c["boundary_title"] for c in chunks] == ["a", "b"]
    assert chunks[0]["start_line"] == 1
    assert chunks[1]["start_line"] == 4


# --------------------------------------------------------------------------
# Round-4 languages: ruby / bash / css scanners.
# --------------------------------------------------------------------------

RUBY_SRC = """require 'json'
CONFIG = { a: 1 }

module Outer
  class Greeter
    def initialize(name)
      @name = name
    end

    def greet
      puts "hi #{@name}" if @name
      [1, 2].each do |x|
        puts x
      end
    end
  end
end

def top_level
  x = 1 unless false
  x
end
"""


def test_ruby_boundaries():
    from gistdex_spark.operators.cst import extract_boundaries

    bs = extract_boundaries(RUBY_SRC, "ruby")
    kinds = [(b.type, b.name) for b in bs]
    assert ("require", None) in kinds
    assert ("assignment", "CONFIG") in kinds
    assert ("module", "Outer") in kinds
    assert ("method", "top_level") in kinds
    mod = next(b for b in bs if b.type == "module")
    # the module spans through its matching end despite the modifier-if,
    # the interpolated string, and the do..end block inside
    assert mod.text.rstrip().endswith("end")
    assert "class Greeter" in mod.text


def test_ruby_unbalanced_raises():
    import pytest as _pytest

    from gistdex_spark.operators.cst import extract_boundaries

    with _pytest.raises(ValueError):
        extract_boundaries("class Foo\n  def bar\n  end\n", "ruby")


BASH_SRC = """#!/bin/bash
NAME="world"
export PATH=/usr/bin

function greet() {
  echo "hello { $NAME }"
  if [ -n "$1" ]; then
    echo "$1"
  fi
}

cleanup() {
  rm -f /tmp/x
}
"""


def test_bash_boundaries():
    from gistdex_spark.operators.cst import extract_boundaries

    bs = extract_boundaries(BASH_SRC, "bash")
    kinds = [(b.type, b.name) for b in bs]
    assert ("function_definition", "greet") in kinds
    assert ("function_definition", "cleanup") in kinds
    assert ("variable_assignment", "NAME") in kinds
    assert ("variable_assignment", "PATH") in kinds
    greet = next(b for b in bs if b.name == "greet")
    # the brace inside the quoted string must not end the body early
    assert greet.text.rstrip().endswith("}")
    assert "fi" in greet.text


CSS_SRC = """@import url("base.css");
/* comment with a { brace */
body, html { margin: 0; color: #fff; }
@media (max-width: 600px) {
  body { font-size: 12px; }
}
@keyframes spin { from { r: 0 } to { r: 360 } }
"""


def test_css_boundaries():
    from gistdex_spark.operators.cst import extract_boundaries

    bs = extract_boundaries(CSS_SRC, "css")
    types = [b.type for b in bs]
    assert types == [
        "import_statement", "rule_set", "media_statement",
        "keyframes_statement",
    ]
    media = next(b for b in bs if b.type == "media_statement")
    assert media.text.count("{") == media.text.count("}")


def test_new_language_ext_dispatch():
    from gistdex_spark.operators.cst import cst_language_for_ext

    assert cst_language_for_ext("lib/foo.rb") == "ruby"
    assert cst_language_for_ext(".sh") == "bash"
    assert cst_language_for_ext("styles/site.css") == "css"


HTML_SRC = """<!DOCTYPE html>
<!-- a comment with <div> inside -->
<header class="top">
  <h1>Title</h1>
  <img src="x.png">
</header>
<script type="text/javascript">
  if (a < b) { document.write("</div>"); }
</script>
<style>
  body { color: red; }
</style>
<main>
  <p>one</p>
  <br/>
</main>
"""


def test_html_boundaries():
    from gistdex_spark.operators.cst import extract_boundaries

    bs = extract_boundaries(HTML_SRC, "html")
    assert [(b.type, b.name) for b in bs] == [
        ("element", "header"),
        ("script_element", "script"),
        ("style_element", "style"),
        ("element", "main"),
    ]
    # raw-text handling: the script body's fake close tag and the `<`
    # comparison must not end the element early
    script = bs[1]
    assert 'document.write' in script.text
    assert script.text.rstrip().endswith("</script>")


def test_html_optional_end_tags_auto_close():
    """HTML5 leaves many end tags optional; the scanner closes whatever
    is still open at EOF instead of rejecting the document (tree-sitter's
    html grammar error-recovers the same way)."""
    import pytest as _pytest

    from gistdex_spark.operators.cst import extract_boundaries

    bs = extract_boundaries("<div><p>x</p>", "html")
    assert [(b.type, b.name) for b in bs] == [("element", "div")]
    assert bs[0].text == "<div><p>x</p>"
    bs2 = extract_boundaries("<p>hello", "html")
    assert [(b.type, b.name) for b in bs2] == [("element", "p")]
    # raw-text elements cannot recover — an unclosed <script> still raises
    with _pytest.raises(ValueError):
        extract_boundaries("<script>var x = 1;", "html")


def test_html_ext_dispatch():
    from gistdex_spark.operators.cst import cst_language_for_ext

    assert cst_language_for_ext("index.html") == "html"
    assert cst_language_for_ext(".htm") == "html"


def test_scanners_never_crash_on_arbitrary_text():
    """Fuzz: every scanner either parses or raises ValueError /
    NotImplementedError (the fallback contract) — never IndexError or
    an unbounded loop on adversarial input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gistdex_spark.operators.cst import extract_boundaries

    langs = ["ruby", "bash", "css", "html", "javascript", "python", "go"]

    @settings(max_examples=120, deadline=None)
    @given(st.text(alphabet=st.characters(max_codepoint=0x2FF), max_size=300))
    def check(code):
        for lang in langs:
            try:
                extract_boundaries(code, lang)
            except (ValueError, NotImplementedError, SyntaxError):
                pass

    check()


def test_ruby_value_position_conditional():
    """`x = if cond ... end` opens a block even mid-line; modifier forms
    after a value (`x = 1 unless y`) do not."""
    from gistdex_spark.operators.cst import extract_boundaries

    rb = (
        "def pick(a)\n  x = if a\n    1\n  else\n    2\n  end\n  x\nend\n"
        "\ndef second\nend\n"
    )
    bs = extract_boundaries(rb, "ruby")
    assert [(b.type, b.name) for b in bs] == [
        ("method", "pick"), ("method", "second")
    ]
    pick = bs[0]
    assert pick.text.rstrip().endswith("end")
    assert "  x\nend" in pick.text  # body NOT truncated at the inner end


def test_ruby_loop_do_not_double_counted():
    from gistdex_spark.operators.cst import extract_boundaries

    rb = "def tick\n  i = 0\n  while i < 3 do\n    i += 1\n  end\nend\n"
    bs = extract_boundaries(rb, "ruby")
    assert [(b.type, b.name) for b in bs] == [("method", "tick")]
    assert bs[0].text.rstrip().endswith("end")


def test_treesitter_dispatch_absent_falls_back_cleanly():
    """In a container without tree-sitter wheels the dispatch must return
    None (cached) and extract_boundaries must still serve the hand-built
    scanner — the PIL-style optional-import contract."""
    import importlib.util

    from gistdex_spark.operators import cst

    if importlib.util.find_spec("tree_sitter") is not None:
        pytest.skip("real tree-sitter present; covered by the test below")
    assert cst._treesitter_parser("python") is None
    assert cst._treesitter_parser("python") is None  # cached miss, no retry
    bs = cst.extract_boundaries("def f():\n    return 1\n", "python")
    assert [(b.type, b.name) for b in bs] == [("function_definition", "f")]


def test_treesitter_dispatch_real_grammar_when_available():
    """Where the wheel exists (not this container), the SAME contract must
    come back from the real grammar: outermost inventory nodes, names,
    spans."""
    import importlib.util

    from gistdex_spark.operators import cst

    if (
        importlib.util.find_spec("tree_sitter") is None
        or importlib.util.find_spec("tree_sitter_python") is None
    ):
        pytest.skip("tree-sitter runtime/grammar wheel not installed")
    parser = cst._treesitter_parser("python")
    assert parser is not None
    bs = cst.extract_boundaries(
        "import os\n\nclass A:\n    def m(self):\n        pass\n", "python"
    )
    assert ("import_statement", None) == (bs[0].type, bs[0].name)
    assert ("class_definition", "A") == (bs[1].type, bs[1].name)


def test_ruby_do_as_method_symbol_or_key_not_an_opener():
    """`items.do` (method call), `:do` (symbol) and `do:` (hash key) must
    not count as block openers — only line-final `do` or `do |args|`
    (the real block forms) open a block. A bare-word miscount would skew
    depth for the rest of the file and silently truncate the method."""
    from gistdex_spark.operators.cst import extract_boundaries

    rb = (
        "def safe\n  items.do\n  h = {do: 1}\n  s = :do\n"
        "  xs.each do |x|\n    puts x\n  end\n"
        "  loop do\n    break\n  end\nend\n"
        "\ndef after\nend\n"
    )
    bs = extract_boundaries(rb, "ruby")
    assert [(b.type, b.name) for b in bs] == [
        ("method", "safe"), ("method", "after")
    ]
    assert "loop do" in bs[0].text and bs[0].text.rstrip().endswith("end")


def test_bash_heredoc_brace_does_not_close_function():
    from gistdex_spark.operators.cst import extract_boundaries

    sh = "f() {\n  cat <<EOF\n}\nEOF\n  echo done\n}\n"
    f = next(
        b for b in extract_boundaries(sh, "bash") if b.name == "f"
    )
    assert "echo done" in f.text
    assert f.text.rstrip().endswith("}")
