"""WASM frontend: hand-assembled binaries -> Program -> VM, differential
against Python semantics (reference crates/wasm — SURVEY.md §2.8)."""

import pytest

from cairo_m_tpu.isa.abi_codec import InputValue
from cairo_m_tpu.vm.runner import run_cairo_program
from cairo_m_tpu.wasm import WasmError, compile_wasm, load_wasm


# -- minimal wasm assembler ------------------------------------------------

def uleb(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def sleb(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        done = (v == 0 and not b7 & 0x40) or (v == -1 and b7 & 0x40)
        out += bytes([b7 | (0 if done else 0x80)])
        if done:
            return out


def sec(sid, payload):
    return bytes([sid]) + uleb(len(payload)) + payload


def functype(n_params, n_results):
    return b"\x60" + uleb(n_params) + b"\x7f" * n_params + uleb(n_results) + b"\x7f" * n_results


def module(types, funcs, exports, bodies, mem_pages=None, data=()):
    """types: list of (np, nr); funcs: type indices; exports: {name: idx};
    bodies: list of (n_i32_locals, code_bytes); mem_pages: memory section
    limits.min; data: list of (byte offset, bytes) active segments."""
    out = b"\x00asm\x01\x00\x00\x00"
    out += sec(1, uleb(len(types)) + b"".join(functype(*t) for t in types))
    out += sec(3, uleb(len(funcs)) + b"".join(uleb(i) for i in funcs))
    if mem_pages is not None:
        out += sec(5, uleb(1) + b"\x00" + uleb(mem_pages))
    ex = uleb(len(exports))
    for name, idx in exports.items():
        nb = name.encode()
        ex += uleb(len(nb)) + nb + b"\x00" + uleb(idx)
    out += sec(7, ex)
    code = uleb(len(bodies))
    for n_locals, body in bodies:
        locs = (uleb(1) + uleb(n_locals) + b"\x7f") if n_locals else uleb(0)
        entry = locs + body + b"\x0b"
        code += uleb(len(entry)) + entry
    out += sec(10, code)
    if data:
        d = uleb(len(data))
        for off, payload in data:
            d += uleb(0) + b"\x41" + sleb(off) + b"\x0b"
            d += uleb(len(payload)) + payload
        out += sec(11, d)
    return out


LG0, LG1, LG2 = b"\x20\x00", b"\x20\x01", b"\x20\x02"
LS0, LS1, LS2 = b"\x21\x00", b"\x21\x01", b"\x21\x02"


def i32c(v):
    return b"\x41" + sleb(v)


def run(wasm, entry, args):
    out = compile_wasm(wasm)
    res = run_cairo_program(
        out.program, entry, [InputValue.number(a) for a in args]
    )
    return res.return_values[0].flatten()


def test_add_mul():
    w = module(
        [(2, 1)], [0], {"addmul": 0},
        [(0, LG0 + LG1 + b"\x6a" + LG0 + b"\x6c")],  # (a+b)*a
    )
    assert run(w, "addmul", [7, 9]) == (7 + 9) * 7


def test_wrapping_and_divrem():
    # f(a, b) = (a - b) + a/b + a%b  with u32 wrap-around
    w = module(
        [(2, 1)], [0], {"f": 0},
        [(0, LG0 + LG1 + b"\x6b" + LG0 + LG1 + b"\x6e" + b"\x6a"
          + LG0 + LG1 + b"\x70" + b"\x6a")],
    )
    a, b = 5, 123456
    want = (((a - b) & 0xFFFFFFFF) + a // b + a % b) & 0xFFFFFFFF
    assert run(w, "f", [a, b]) == want


def test_comparisons_are_i32():
    # (a < b) + (a == b) + eqz(a) : comparison results add as i32 0/1
    w = module(
        [(2, 1)], [0], {"cmp": 0},
        [(0, LG0 + LG1 + b"\x49" + LG0 + LG1 + b"\x46" + b"\x6a"
          + LG0 + b"\x45" + b"\x6a")],
    )
    assert run(w, "cmp", [3, 9]) == 1
    assert run(w, "cmp", [9, 9]) == 1
    assert run(w, "cmp", [0, 9]) == 2


def test_fib_loop():
    # locals: p0=n, l1=a, l2=b; loop with br_if
    body = (
        i32c(1) + LS2  # b = 1
        + b"\x02\x40"  # block
        + b"\x03\x40"  # loop
        + LG0 + b"\x45" + b"\x0d\x01"  # if n == 0 br out
        + LG1 + LG2 + b"\x6a"  # a + b
        + LG1 + LS2 + b"\x21\x01"[:0]  # (placeholder, unused)
        + LS1 * 0
        + b""
        + b"\x0b\x0b"
    )
    # build carefully: tmp = a + b; a = b; b = tmp; n = n - 1
    body = (
        i32c(1) + LS2
        + b"\x02\x40"
        + b"\x03\x40"
        + LG0 + b"\x45" + b"\x0d\x01"
        + LG2 + LG1 + LG2 + b"\x6a" + LS2 + LS1  # a'=b (stack), b'=a+b
        + LG0 + i32c(1) + b"\x6b" + LS0  # n -= 1
        + b"\x0c\x00"  # br loop (continue)
        + b"\x0b" + b"\x0b"
        + LG1
    )
    w = module([(1, 1)], [0], {"fib": 0}, [(2, body)])
    def pyfib(n):
        a, b = 0, 1
        for _ in range(n):
            a, b = b, (a + b) & 0xFFFFFFFF
        return a
    for n in (0, 1, 2, 10, 30):
        assert run(w, "fib", [n]) == pyfib(n), n


def test_call_and_select():
    # g(x) = x*3 ; f(a,b) = select(g(a), g(b), a < b)
    g = (0, LG0 + i32c(3) + b"\x6c")
    f = (0, LG0 + b"\x10\x01" + LG1 + b"\x10\x01" + LG0 + LG1 + b"\x49" + b"\x1b")
    w = module([(2, 1), (1, 1)], [0, 1], {"f": 0, "g": 1}, [f, g])
    assert run(w, "f", [2, 5]) == 6   # a<b -> g(a)
    assert run(w, "f", [5, 2]) == 6   # !(a<b) -> g(b)


def test_if_else():
    # f(a) = if a > 10 { a - 10 } else { a + 100 }
    body = (
        LG0 + i32c(10) + b"\x4b"  # a > 10
        + b"\x04\x7f"  # if (result i32)
        + LG0 + i32c(10) + b"\x6b"
        + b"\x05"
        + LG0 + i32c(100) + b"\x6a"
        + b"\x0b"
    )
    w = module([(1, 1)], [0], {"f": 0}, [(0, body)])
    assert run(w, "f", [25]) == 15
    assert run(w, "f", [3]) == 103


def test_loader_rejects_non_wasm():
    with pytest.raises(WasmError):
        load_wasm(b"\x7fELF")


def test_unsupported_op_raises():
    w = module([(0, 1)], [0], {"f": 0}, [(0, b"\x41\x00\xa7")])  # i32.wrap_i64?
    with pytest.raises(WasmError):
        compile_wasm(w)


# -- linear memory ---------------------------------------------------------

def _memarg(offset=0, align=2):
    return uleb(align) + uleb(offset)


I32_LOAD = b"\x28"
I32_STORE = b"\x36"


def _mem_rw_module():
    # store(i, v): mem[4*i] = v; load(i) -> mem[4*i]
    store_body = (
        LG0 + i32c(4) + b"\x6c"  # addr = i * 4
        + LG1 + I32_STORE + _memarg()
        + LG0 + i32c(4) + b"\x6c" + I32_LOAD + _memarg()  # return mem[4i]
    )
    return module(
        [(2, 1)], [0], {"memrw": 0}, [(0, store_body)], mem_pages=1
    )


def test_memory_store_load_roundtrip():
    w = _mem_rw_module()
    assert run(w, "memrw", [0, 123456789]) == 123456789
    assert run(w, "memrw", [100, 0xFFFFFFFF]) == 0xFFFFFFFF


def test_memory_untouched_reads_zero():
    # load from an address never stored -> wasm zero page
    body = LG0 + I32_LOAD + _memarg()
    w = module([(1, 1)], [0], {"peek": 0}, [(0, body)], mem_pages=1)
    assert run(w, "peek", [64]) == 0


def test_memory_static_offset():
    # mem[base + 8] = v via the memarg offset immediate; read it back
    body = (
        LG0 + LG1 + I32_STORE + _memarg(offset=8)
        + LG0 + i32c(8) + b"\x6a" + I32_LOAD + _memarg()
    )
    w = module([(2, 1)], [0], {"f": 0}, [(0, body)], mem_pages=1)
    assert run(w, "f", [16, 77]) == 77


def test_data_segment_init():
    # data segment: word 42 at byte offset 8, "abcd" at 16; untouched is 0
    data = [(8, (42).to_bytes(4, "little")), (16, b"abcd")]
    body = LG0 + I32_LOAD + _memarg()
    w = module(
        [(1, 1)], [0], {"peek": 0}, [(0, body)], mem_pages=1, data=data
    )
    assert run(w, "peek", [8]) == 42
    assert run(w, "peek", [16]) == int.from_bytes(b"abcd", "little")
    assert run(w, "peek", [32]) == 0


def test_memory_sum_loop():
    # write i*i to mem[4i] for i in 0..n, then sum the words back
    body = (
        # i = 0
        i32c(0) + LS1
        + b"\x03\x40"  # loop
        + LG1 + i32c(4) + b"\x6c" + LG1 + LG1 + b"\x6c" + I32_STORE + _memarg()
        + LG1 + i32c(1) + b"\x6a" + LS1
        + LG1 + LG0 + b"\x49" + b"\x0d\x00"  # br_if i < n
        + b"\x0b"
        # acc = 0; i = 0
        + i32c(0) + LS2 + i32c(0) + LS1
        + b"\x03\x40"
        + LG2 + LG1 + i32c(4) + b"\x6c" + I32_LOAD + _memarg() + b"\x6a" + LS2
        + LG1 + i32c(1) + b"\x6a" + LS1
        + LG1 + LG0 + b"\x49" + b"\x0d\x00"
        + b"\x0b"
        + LG2
    )
    w = module([(1, 1)], [0], {"sumsq": 0}, [(2, body)], mem_pages=1)
    n = 20
    assert run(w, "sumsq", [n]) == sum(i * i for i in range(n)) & 0xFFFFFFFF


@pytest.mark.slow
def test_memory_module_proves():
    # VERDICT r4 missing #6: a memory-using wasm module compiles, runs, and
    # PROVES end to end (ref `crates/wasm/src/lowering/mod.rs:1-50`)
    from cairo_m_tpu.prover.adapter.native_import import native_prover_input
    from cairo_m_tpu.prover.config import (
        set_production_scale,
        set_test_scale,
        test_config,
    )
    from cairo_m_tpu.prover.prove import prove_cairo_m
    from cairo_m_tpu.prover.verify import verify_cairo_m

    set_test_scale(rc_big_bits=10, bitwise_log=8)
    try:
        w = _mem_rw_module()
        out = compile_wasm(w)
        # call-slot encoding: u32 args are two 16-bit limbs each
        pi = native_prover_input(out.program, "memrw", [3, 0, 999, 0])
        cfg = test_config(n_queries=8, pow_bits=2)
        proof = prove_cairo_m(pi, cfg)
        assert verify_cairo_m(proof, cfg)
    finally:
        set_production_scale()
