"""Tape-compiled composition vs direct host-array evaluation.

The tape interpreter (cairo_m_tpu/prover/stark/tape.py) must produce the
exact alpha-chained, vanishing-divided composition contribution that a
direct HostArrayOps evaluation of the same component yields on the extended
domain.  Covers: trace/interaction/preprocessed banks, row offsets (the
LogUp cumulative column at offset -1), constant folding/CSE, and register
allocation, on components spanning the full tape-size range.
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
from cairo_m_tpu.prover.stark import domain, fft
from cairo_m_tpu.prover.stark.air import (
    EvalAtRow,
    HostArrayOps,
    Val,
    logup_shift_scalar,
)
from cairo_m_tpu.prover.stark.framework import (
    gen_interaction_trace,
    record_component_tape,
)
from cairo_m_tpu.prover.stark.fri import qscalar_mul
from cairo_m_tpu.prover.stark.tape import run_tape

P = (1 << 31) - 1
BLOWUP = 1


@pytest.fixture(scope="module")
def comps():
    mem = {i: ((i + 1, 2 * i, 3 * i, (7 * i) % 11), 0, 0) for i in range(5)}
    seg = Segment(initial_memory=mem, memory_trace=[], trace=[State(0, 0)])
    pi = import_from_runner_output(seg, PublicAddressRanges.new(0, 0, 0))
    rel = Relations()
    rnd = random.Random(7)
    for r in rel.all():
        r.z = tuple(rnd.randrange(P) for _ in range(4))
        a = tuple(rnd.randrange(P) for _ in range(4))
        pw = [(1, 0, 0, 0)]
        for _ in range(r.arity - 1):
            pw.append(qscalar_mul(pw[-1], a))
        r.alpha_powers = pw
    cs = ComponentSet(rel)
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

    tape, n_regs, consts, scratch, bank = record_component_tape(
        comp, claimed, RANDOM_COEFF
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
    src = np.zeros(len(bank), np.int32)
    shv = np.zeros(len(bank), np.uint32)
    for j, (kind, idx, off) in enumerate(bank):
        if kind == "t":
            src[j] = idx
        elif kind == "i":
            src[j] = Kt + idx
        elif kind == "p":
            src[j] = Kt + Ki + idx
        else:
            src[j] = Kt + Ki + Kp
        shv[j] = (roll * off) % n
    got = run_tape(
        (text_s, iext_s, pext_s, vrow), src, shv, consts, tape, n_regs,
        scratch, elog,
    )
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


def _check_interaction_device(comp):
    from cairo_m_tpu.prover.stark.framework import (
        gen_interaction_trace_device,
    )

    pp = comp.preprocessed_columns() if comp.n_preprocessed_cols else ()
    want_cols, want_claimed = gen_interaction_trace(comp, comp.trace_rows, pp)
    st = jnp.asarray(np.stack(comp.trace_rows))
    ps = (
        jnp.asarray(np.stack(pp))
        if pp
        else jnp.zeros((0, 1 << comp.log_size), jnp.uint32)
    )
    got_stacked, got_claimed = gen_interaction_trace_device(comp, st, ps)
    assert got_claimed == tuple(int(x) for x in want_claimed)
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
