"""Column-packed upload must reconstruct witness stacks bit-exactly
(prover/stark/colpack.py) — packing a wrong bit would silently corrupt a
committed column and only surface as a verification failure."""

import numpy as np
import pytest

from cairo_m_tpu.prover.stark import colpack


@pytest.fixture(scope="module", autouse=True)
def _test_scale():
    from cairo_m_tpu.prover.config import set_production_scale, set_test_scale

    set_test_scale(rc_big_bits=10, bitwise_log=8)
    yield
    set_production_scale()


@pytest.fixture(scope="module")
def fib_comps():
    from cairo_m_tpu.compiler import compile_cairo
    from cairo_m_tpu.isa.abi_codec import InputValue
    from cairo_m_tpu.prover.adapter.adapter import import_from_runner_output
    from cairo_m_tpu.prover.components.registry import ComponentSet
    from cairo_m_tpu.prover.relations import Relations
    from cairo_m_tpu.vm.runner import run_cairo_program

    src = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""
    program = compile_cairo(src).program
    res = run_cairo_program(program, "main", [InputValue.number(75)])
    pi = import_from_runner_output(res.vm.segments[0], res.public_address_ranges)
    cs = ComponentSet(Relations())
    cs.write_traces(pi)
    return cs


def test_roundtrip_on_fib_witness(fib_comps):
    checked = 0
    for comp in fib_comps.all:
        if comp.zero_witness or not comp.trace_rows:
            continue
        want = np.stack([np.asarray(r, np.uint32) for r in comp.trace_rows])
        got = np.asarray(
            colpack.upload_stack(comp.trace_rows, comp.non_padded_length)
        )
        np.testing.assert_array_equal(got, want, err_msg=comp.name)
        raw, packed = colpack.packed_bytes(
            comp.trace_rows, comp.non_padded_length
        )
        assert packed <= raw
        checked += 1
    assert checked >= 5


def test_roundtrip_synthetic_kinds():
    n = 1 << 10
    m = 700
    rng = np.random.default_rng(7)
    clock = np.zeros(n, np.uint32)
    clock[:m] = 5 + np.cumsum(rng.integers(0, 9, m).astype(np.uint32))
    prev = np.zeros(n, np.uint32)
    prev[:m] = clock[:m] - np.minimum(
        clock[:m], rng.integers(0, 300, m).astype(np.uint32)
    )
    mult = rng.integers(0, 200, n).astype(np.uint32)
    mult[[3, 77, 500]] = [1 << 20, 70000, 300]
    rows = [
        np.zeros(n, np.uint32),  # z
        np.where(np.arange(n) < m, 7, 0).astype(np.uint32),  # c
        clock,  # d8
        prev,  # r-vs-clock
        rng.integers(0, 250, n).astype(np.uint32),  # u8
        rng.integers(0, 60000, n).astype(np.uint32),  # u16
        mult,  # x8/x16
        rng.integers(0, (1 << 31) - 1, n).astype(np.uint32),  # u32
    ]
    kinds, _ = colpack.classify(rows, m)
    assert [k[0] for k in kinds] == [
        "z", "c", "d8", "r16", "u8", "u16", "x8", "u32"
    ]
    got = np.asarray(colpack.upload_stack(rows, m))
    np.testing.assert_array_equal(got, np.stack(rows))


def test_packing_shrinks_fib_uploads(fib_comps):
    # poseidon2's columns are random hash-state words (incompressible by
    # design); everything else — opcode, memory, merkle, rc tables — must
    # shrink well below raw uint32
    raw_t = packed_t = 0
    for comp in fib_comps.all:
        if comp.zero_witness or not comp.trace_rows:
            continue
        if comp.name == "poseidon2":
            continue
        raw, packed = colpack.packed_bytes(
            comp.trace_rows, comp.non_padded_length
        )
        raw_t += raw
        packed_t += packed
    assert packed_t < 0.6 * raw_t, (raw_t, packed_t)
