"""Formatter, diagnostics battery, and project manifest tests
(reference crates/compiler/{formatter,diagnostics,cairo-m-project} +
cargo-cairo-m — SURVEY.md §2.3/§2.8)."""

import os

import pytest

from cairo_m_tpu.compiler import CompilationError, compile_cairo
from cairo_m_tpu.compiler.formatter import check_idempotent, format_source
from cairo_m_tpu.compiler.parser import parse
from cairo_m_tpu.compiler.project import (
    compile_project,
    discover_project,
    init_project,
)
from cairo_m_tpu.isa.abi_codec import InputValue
from cairo_m_tpu.vm.runner import run_cairo_program


# ---------------------------------------------------------------------------
# formatter
# ---------------------------------------------------------------------------

UGLY = """
// fib
fn main( n:felt )->felt{
  let a=0;let b=1;   // init pair
    let i = 0;
  while i!=n {
     let t=a+b; a=b;b=t;
     i=i+1;
  }


  return a ;
}
struct P{x:felt,y:u32}
"""


def test_formatter_idempotent():
    assert check_idempotent(UGLY)


def test_formatter_preserves_comments():
    out = format_source(UGLY)
    assert "// fib" in out
    assert "// init pair" in out


def test_formatter_canonical_shape():
    out = format_source(UGLY)
    assert "fn main(n: felt) -> felt {" in out
    assert "    while i != n {" in out
    assert "        let t = a + b;" in out
    # at most one blank line anywhere
    assert "\n\n\n" not in out


def test_formatter_roundtrip_semantics():
    """Formatted source must parse to the same program behavior."""
    prog_a = compile_cairo(UGLY).program
    prog_b = compile_cairo(format_source(UGLY)).program
    ra = run_cairo_program(prog_a, "main", [InputValue.number(10)])
    rb = run_cairo_program(prog_b, "main", [InputValue.number(10)])
    assert [v.flatten() for v in ra.return_values] == [
        v.flatten() for v in rb.return_values
    ]


def test_formatter_mdtest_corpus_idempotent():
    """Every cairo-m block in the mdtest corpus formats idempotently."""
    import os

    from cairo_m_tpu.testing.mdtest import discover

    root = os.path.join(os.path.dirname(__file__), "mdtest")
    checked = 0
    for test in discover(root):
        assert check_idempotent(test.cairo_source), f"not idempotent: {test.name}"
        checked += 1
    assert checked > 50


def test_formatter_wraps_long_lines():
    """Doc-IR groups: long call/param lists break at commas with one level
    of indent; short ones stay flat (reference doc.rs group semantics)."""
    src = (
        "fn f(first_argument: felt, second_argument: felt, third_argument: "
        "felt, fourth_argument: felt, fifth_argument: felt) -> felt { "
        "return helper(first_argument + second_argument, third_argument, "
        "fourth_argument * fifth_argument, another_helper(first_argument, "
        "second_argument, 1234567)); }"
    )
    out = format_source(src)
    assert all(len(l) <= 100 for l in out.splitlines()), out
    assert "fn f(\n    first_argument: felt,\n" in out
    assert check_idempotent(src)
    # short lines stay flat
    flat = format_source("fn g(a: felt) -> felt { return a + 1; }")
    assert flat == "fn g(a: felt) -> felt {\n    return a + 1;\n}\n"


def test_doc_engine_group_semantics():
    from cairo_m_tpu.compiler import doc

    d = doc.group(
        doc.concat(
            [
                doc.text("("),
                doc.indent(4, doc.concat([doc.softline(), doc.text("abc"),
                                          doc.text(","), doc.line(),
                                          doc.text("def")])),
                doc.softline(),
                doc.text(")"),
            ]
        )
    )
    assert doc.render(d, 100) == "(abc, def)"
    assert doc.render(d, 8) == "(\n    abc,\n    def\n)"


# ---------------------------------------------------------------------------
# diagnostics battery
# ---------------------------------------------------------------------------


def test_diagnostics_accumulate():
    src = """
fn ok(x: felt) -> felt { return x; }
fn bad1() -> felt { return nope; }
fn bad2(x: felt) -> u32 { return x; }
fn bad3(x: felt) -> felt { return missing(x); }
"""
    with pytest.raises(CompilationError) as ei:
        compile_cairo(src)
    msgs = [d.message for d in ei.value.diagnostics]
    assert len(msgs) == 3
    assert any("nope" in m for m in msgs)
    assert any("mismatch" in m for m in msgs)
    assert any("missing" in m for m in msgs)


def test_diagnostics_render_with_caret():
    src = "fn f() -> felt { return zzz; }"
    with pytest.raises(CompilationError) as ei:
        compile_cairo(src)
    rendered = ei.value.render()
    assert "error: unknown variable zzz" in rendered
    assert "--> <input>:1" in rendered
    assert "^" in rendered


# ---------------------------------------------------------------------------
# project manifest + multi-file use
# ---------------------------------------------------------------------------


def test_project_multifile(tmp_path):
    root = str(tmp_path / "proj")
    init_project(root, "demo")
    with open(os.path.join(root, "src", "math.cm"), "w") as f:
        f.write("fn square(x: felt) -> felt { return x * x; }\n")
    with open(os.path.join(root, "src", "main.cm"), "w") as f:
        f.write(
            "use math::square;\n"
            "fn main(x: felt) -> felt { return square(x) + 1; }\n"
        )
    out = compile_project(os.path.join(root, "src", "main.cm"))
    res = run_cairo_program(out.program, "main", [InputValue.number(7)])
    assert res.return_values[0].flatten() == 50


def test_project_nested_module(tmp_path):
    root = str(tmp_path / "p2")
    init_project(root, "p2")
    os.makedirs(os.path.join(root, "src", "util"))
    with open(os.path.join(root, "src", "util", "ops.cm"), "w") as f:
        f.write("fn triple(x: felt) -> felt { return 3 * x; }\n")
    with open(os.path.join(root, "src", "main.cm"), "w") as f:
        f.write(
            "use util::ops::triple;\n"
            "fn main(x: felt) -> felt { return triple(x); }\n"
        )
    out = compile_project(root + "/src/main.cm")
    res = run_cairo_program(out.program, "main", [InputValue.number(5)])
    assert res.return_values[0].flatten() == 15


def test_project_discovery_walks_up(tmp_path):
    root = str(tmp_path / "p3")
    init_project(root, "p3")
    proj = discover_project(os.path.join(root, "src"))
    assert proj.manifest.name == "p3"
    assert proj.root == root


def test_project_missing_module(tmp_path):
    root = str(tmp_path / "p4")
    init_project(root, "p4")
    with open(os.path.join(root, "src", "main.cm"), "w") as f:
        f.write("use nowhere::thing;\nfn main() -> felt { return 1; }\n")
    with pytest.raises(CompilationError, match="module file not found"):
        compile_project(root + "/src/main.cm")
