"""Compiler end-to-end tests: compile .cm sources and run them on the VM,
mirroring the reference's mdtest + differential test strategy (SURVEY.md §4).
"""

import pytest

from cairo_m_tpu.compiler import CompilationError, CompilerOptions, compile_cairo
from cairo_m_tpu.isa.abi_codec import InputValue
from cairo_m_tpu.vm.runner import run_cairo_program

P = (1 << 31) - 1


def run(src, entry, args=(), opt="standard"):
    out = compile_cairo(src, options=CompilerOptions(optimization_level=opt))
    res = run_cairo_program(
        out.program, entry, [InputValue.number(a) for a in args]
    )
    vals = [v.flatten() for v in res.return_values]
    return vals[0] if len(vals) == 1 else vals


FIB = """
fn fibonacci_loop(n: felt) -> felt {
    let a = 0;
    let b = 1;
    let i = 0;
    while i != n {
        let temp = a + b;
        a = b;
        b = temp;
        i = i + 1;
    }
    return a;
}
"""


def test_fibonacci():
    assert run(FIB, "fibonacci_loop", [10]) == 55
    assert run(FIB, "fibonacci_loop", [0]) == 0
    assert run(FIB, "fibonacci_loop", [1]) == 1


def test_arithmetic_and_div():
    src = """
fn calc(x: felt, y: felt) -> felt {
    let s = x + y * 2 - 3;
    let d = s / y;
    return d * y + 7;
}
"""
    x, y = 100, 9
    s = (x + y * 2 - 3) % P
    d = (s * pow(y, P - 2, P)) % P
    assert run(src, "calc", [x, y]) == (d * y + 7) % P


def test_functions_and_recursion():
    src = """
fn fact(n: felt) -> felt {
    if n == 0 {
        return 1;
    }
    return n * fact(n - 1);
}
fn main() -> felt { return fact(6); }
"""
    assert run(src, "main") == 720


def test_mutual_recursion():
    src = """
fn is_even(n: felt) -> felt {
    if n == 0 { return 1; }
    return is_odd(n - 1);
}
fn is_odd(n: felt) -> felt {
    if n == 0 { return 0; }
    return is_even(n - 1);
}
fn main() -> felt { return is_even(10) * 10 + is_odd(7); }
"""
    assert run(src, "main") == 11


def test_tuples_and_destructuring():
    src = """
fn create() -> (felt, felt, felt) { return (1, 2, 3); }
fn main() -> felt {
    let t = create();
    let (a, b, c) = (10, 20, 30);
    return t.0 + t.1 + t.2 + a + b + c;
}
"""
    assert run(src, "main") == 66


def test_structs():
    src = """
struct Point { x: felt, y: felt }
fn main() -> felt {
    let p = Point { x: 10, y: 20 };
    p.x = 7;
    return p.x * p.y;
}
"""
    assert run(src, "main") == 140


def test_arrays_and_indexing():
    src = """
fn main() -> felt {
    let arr = [5, 6, 7, 8];
    arr[1] = 60;
    let i = 3;
    return arr[0] + arr[1] + arr[i];
}
"""
    assert run(src, "main") == 5 + 60 + 8


def test_array_params_by_pointer():
    src = """
fn sum3(a: [felt; 3]) -> felt { return a[0] + a[1] + a[2]; }
fn main() -> felt {
    let arr = [1, 2, 3];
    return sum3(arr);
}
"""
    assert run(src, "main") == 6


def test_for_loop_and_break():
    src = """
fn main() -> felt {
    let sum = 0;
    for (let i = 0; i != 10; i = i + 1) {
        sum = sum + i;
    }
    let j = 10;
    loop {
        if j == 7 { break; }
        j = j - 1;
    }
    return sum * 100 + j;
}
"""
    assert run(src, "main") == 4507


def test_u32_ops():
    src = """
fn main(a: u32, b: u32) -> u32 {
    let s = a + b;
    let m = s * 3u32;
    let d = m / 7u32;
    let r = m % 7u32;
    let x = (a & b) | (a ^ b);
    return d + r + x;
}
"""
    a, b = 123456789, 987654321
    s = (a + b) % (1 << 32)
    m = (s * 3) % (1 << 32)
    want = (m // 7 + m % 7 + ((a & b) | (a ^ b))) % (1 << 32)
    assert run(src, "main", [a, b]) == want


def test_u32_comparisons():
    src = """
fn main(a: u32, b: u32) -> felt {
    let r = 0;
    if a < b { r = r + 1; }
    if a <= b { r = r + 10; }
    if a == b { r = r + 100; }
    if a != b { r = r + 1000; }
    if b > a { r = r + 10000; }
    return r;
}
"""
    assert run(src, "main", [5, 9]) == 11011
    assert run(src, "main", [9, 9]) == 110


def test_u32_to_felt_cast():
    src = """
fn main(x: u32) -> felt {
    let y: felt = x as felt;
    return y + 1;
}
"""
    assert run(src, "main", [2147483646]) == 0  # P-1 + 1 == 0 mod P


def test_felt_to_u32_cast_rejected():
    src = """
fn main() -> u32 {
    let x: felt = 10;
    return x as u32;
}
"""
    with pytest.raises(CompilationError):
        compile_cairo(src)


def test_heap_new():
    src = """
fn main() -> felt {
    let p: felt* = new felt[3];
    p[0] = 7;
    p[1] = 8;
    p[2] = 9;
    let q: felt* = new felt[2];
    q[0] = 100;
    return p[0] + p[1] + p[2] + q[0];
}
"""
    assert run(src, "main") == 124


def test_logical_ops():
    src = """
fn main(x: felt) -> felt {
    if x == 1 || x == 3 {
        return 100;
    }
    if x != 0 && x != 2 {
        return 50;
    }
    return 7;
}
"""
    assert run(src, "main", [3]) == 100
    assert run(src, "main", [5]) == 50
    assert run(src, "main", [2]) == 7


def test_consts():
    src = """
const SIZE = 5;
fn main() -> felt { return SIZE * 2; }
"""
    assert run(src, "main") == 10


def test_opt_equivalence():
    """Same source at none vs standard must produce identical results
    (reference opt_equivalence.rs)."""
    for args in ([0], [1], [13]):
        assert run(FIB, "fibonacci_loop", args, opt="none") == run(
            FIB, "fibonacci_loop", args, opt="standard"
        )
    src = """
fn main() -> felt {
    let x = 3 * 4 + 1;
    if 1 == 1 { x = x + 2; }
    while 0 != 0 { x = 99; }
    return x * 1 + 0;
}
"""
    assert run(src, "main", opt="none") == run(src, "main", opt="standard") == 15


def test_semantic_errors():
    with pytest.raises(CompilationError):
        compile_cairo("fn f() -> felt { return x; }")
    with pytest.raises(CompilationError):
        compile_cairo("fn f() -> felt { let a: u32 = 1u32; return a + 1; }")
    with pytest.raises(CompilationError):
        compile_cairo("fn f() -> felt { break; return 1; }")
