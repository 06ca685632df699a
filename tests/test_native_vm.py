"""Native VM+adapter core vs the Python reference path: same ProverInput."""

import numpy as np
import pytest

from cairo_m_tpu import native
from cairo_m_tpu.compiler import compile_cairo
from cairo_m_tpu.isa.abi_codec import InputValue
from cairo_m_tpu.prover.adapter.adapter import import_from_runner_output
from cairo_m_tpu.prover.adapter.native_import import native_prover_input
from cairo_m_tpu.prover.debug_tools import assert_constraints
from cairo_m_tpu.vm.runner import run_cairo_program

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

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


def both_inputs(src, entry, args):
    prog = compile_cairo(src).program
    res = run_cairo_program(prog, entry, [InputValue.number(a) for a in args])
    py = import_from_runner_output(res.vm.segments[0], res.public_address_ranges)
    # call-slot encode scalars
    flat = []
    info = prog.get_entrypoint(entry)
    for p, a in zip(info.params, args):
        if p.ty.kind == "u32":
            flat += [a & 0xFFFF, a >> 16]
        else:
            flat.append(a)
    nat = native_prover_input(prog, entry, flat)
    return py, nat


def compare(py, nat):
    assert py.total_steps == nat.total_steps
    assert py.initial_registers == nat.initial_registers
    assert py.final_registers == nat.final_registers
    assert py.initial_memory == nat.initial_memory
    assert py.final_memory == nat.final_memory
    assert py.clock_update_data == nat.clock_update_data
    assert py.merkle_trees.initial_root == nat.merkle_trees.initial_root
    assert py.merkle_trees.final_root == nat.merkle_trees.final_root
    assert set(py.states_by_opcodes) == set(nat.states_by_opcodes)
    for op, pb in py.states_by_opcodes.items():
        nb = nat.states_by_opcodes[op]
        np.testing.assert_array_equal(pb.pc, nb.pc)
        np.testing.assert_array_equal(pb.fp, nb.fp)
        np.testing.assert_array_equal(pb.clock, nb.clock)
        np.testing.assert_array_equal(pb.inst_prev_clock, nb.inst_prev_clock)
        np.testing.assert_array_equal(pb.operands, nb.operands)
        np.testing.assert_array_equal(pb.instr_words, nb.instr_words)


def test_native_matches_python_fib():
    py, nat = both_inputs(FIB, "main", [30])
    compare(py, nat)


def test_native_matches_python_mixed():
    src = """
fn main(a: u32, b: u32, x: felt) -> felt {
    let q = a / b;
    let r = a % b;
    let s = (a & b) | (a ^ 3u32);
    let le = x <= 1000;
    let p: felt* = new felt[2];
    p[0] = x * 2;
    let arr = [x, x + 1];
    if q == 0u32 || le {
        return p[0] + arr[1] + (s == 0u32) as felt;
    }
    return helper(x) + r as felt;
}
fn helper(v: felt) -> felt { return v / 3; }
"""
    py, nat = both_inputs(src, "main", [123456789, 7777, 500])
    compare(py, nat)
    assert assert_constraints(nat) == []


def test_native_speed():
    prog = compile_cairo(FIB).program
    import time

    t0 = time.time()
    pi = native_prover_input(prog, "main", [200000])
    dt = time.time() - t0
    # ~8 steps/iteration after the MIR pipeline (was 12 pre-MIR)
    assert pi.total_steps > 1_400_000
    # smoke floor only: CI machines share cores with jax device pools and
    # concurrent compile jobs; the native core measures ~1-5 Msteps/s
    # unloaded (see bench.py)
    assert pi.total_steps / dt > 2e4, f"only {pi.total_steps / dt:.0f} steps/s"


def test_native_segments_match_python():
    """Continuation via the native core: per-segment ProverInputs must match
    the Python VM+adapter path exactly (bundles, memories, roots), and
    consecutive roots must chain (final_root(k) == initial_root(k+1))."""
    from cairo_m_tpu.prover.adapter.native_import import (
        native_segment_prover_inputs,
    )
    from cairo_m_tpu.vm.runner import RunnerOptions

    prog = compile_cairo(FIB).program
    res = run_cairo_program(
        prog, "main", [InputValue.number(40)], RunnerOptions(max_steps=100)
    )
    py_segs = [
        import_from_runner_output(s, res.public_address_ranges)
        for s in res.vm.segments
    ]
    nat_segs = list(native_segment_prover_inputs(prog, "main", [40], 100))
    assert len(py_segs) == len(nat_segs) >= 3
    for py, nat in zip(py_segs, nat_segs):
        compare(py, nat)
    for a, b in zip(nat_segs, nat_segs[1:]):
        assert a.merkle_trees.final_root == b.merkle_trees.initial_root
