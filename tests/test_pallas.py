"""Pallas BLAKE2s leaf kernel vs host hashlib golden path.

Runs in Pallas interpreter mode on the CPU test mesh (CM_PALLAS_INTERPRET);
on a real TPU the same kernel compiles to Mosaic and is used by
prover/stark/merkle.py for Merkle leaf hashing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cairo_m_tpu.hash import blake2s_pallas
from cairo_m_tpu.hash.blake2s import hash_words_np
from cairo_m_tpu.prover.stark import wtape_pallas


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    """Scope Pallas interpreter mode to THIS module only.

    A previous revision set CM_PALLAS_INTERPRET=1 in os.environ at import
    time, which leaked process-wide: `wtape_pallas` is imported lazily by
    the first PROVE after this module ran, picked the flag up, and every
    later prover test streamed its composition through the Pallas
    interpreter (~minutes per kernel — the fast tier hung at
    test_prover_static).  Flip the module flags directly and clear the
    kernel-builder caches (they bake `interpret=` at construction)."""
    saved = (blake2s_pallas._INTERPRET, wtape_pallas._INTERPRET)
    blake2s_pallas._INTERPRET = True
    wtape_pallas._INTERPRET = True
    blake2s_pallas._leaf_call.cache_clear()
    wtape_pallas._call.cache_clear()
    yield
    blake2s_pallas._INTERPRET, wtape_pallas._INTERPRET = saved
    blake2s_pallas._leaf_call.cache_clear()
    wtape_pallas._call.cache_clear()


# interpret mode costs ~0.5 s per compression block of 128 lanes, so the
# correctness matrix stays tiny; real-hardware sizes (K=16, n=2^21) are
# exercised + benchmarked on the TPU (numbers in blake2s_pallas.py)
@pytest.mark.parametrize("K,n", [(1, 128), (4, 128), (17, 128)])
def test_pallas_leaf_matches_hashlib(K, n):
    rng = np.random.default_rng(42 + K)
    cols = rng.integers(0, 1 << 32, size=(K, n), dtype=np.uint32)
    got = np.asarray(blake2s_pallas.hash_leaves(jnp.asarray(cols)))
    want = hash_words_np([cols[i] for i in range(K)])  # (n, 8)
    np.testing.assert_array_equal(got.T, want)


def test_pallas_used_by_merkle_on_interpret():
    from cairo_m_tpu.prover.stark import merkle

    rng = np.random.default_rng(7)
    cols = rng.integers(0, (1 << 31) - 1, size=(3, 128), dtype=np.uint32)
    tree = merkle.commit(jnp.asarray(cols))
    # golden: leaf digests with zero-padding to 4 columns
    padded = np.concatenate([cols, np.zeros((1, 128), np.uint32)], axis=0)
    want = hash_words_np([padded[i] for i in range(4)])
    np.testing.assert_array_equal(np.asarray(tree.levels[0]).T, want)


def test_pallas_wide_tape_matches_scan():
    """wtape_pallas.run_plan vs the lax.scan interpreter on a real
    composition plan (fibonacci witness, store_add_fp_fp component)."""
    from cairo_m_tpu.compiler import compile_cairo
    from cairo_m_tpu.isa.abi_codec import InputValue
    from cairo_m_tpu.prover.adapter.adapter import import_from_runner_output
    from cairo_m_tpu.prover.components.registry import ComponentSet
    from cairo_m_tpu.prover.relations import Relations
    from cairo_m_tpu.prover.stark import framework, wtape, wtape_pallas
    from cairo_m_tpu.prover.stark.air import logup_shift_scalar
    from cairo_m_tpu.prover.config import set_test_scale, set_production_scale
    from cairo_m_tpu.vm.runner import run_cairo_program

    set_test_scale(rc_big_bits=10, bitwise_log=8)
    try:
        src = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""
        out = compile_cairo(src)
        res = run_cairo_program(out.program, "main", [InputValue.number(40)])
        pi = import_from_runner_output(
            res.vm.segments[0], res.public_address_ranges
        )
        relations = Relations()
        comps = ComponentSet(relations)
        comps.write_traces(pi)

        class _Ch:
            _i = 0
            def draw_felt(self):
                _Ch._i += 1
                return (_Ch._i * 12345 % 2147483647, _Ch._i, 7, 11)
        relations.draw(_Ch())
        comp = next(c for c in comps.all if c.name == "store_add_fp_fp")
        l = comp.log_size
        elog = l + 1
        plan = framework.composition_plan(comp, relations)
        assert plan.n_steps <= wtape_pallas.MAX_STEPS
        from cairo_m_tpu.prover.stark.framework import _DynResolver, _qpow_scalar
        from cairo_m_tpu.prover.stark.fri import QONE
        apows = [QONE] + [(3 + i, 1, 4, 1) for i in range(60)]
        consts = plan.const_values(_DynResolver(
            relations, shift=logup_shift_scalar((1, 2, 3, 4), l), apows=apows))
        rng = np.random.default_rng(0)
        B = len(plan.used_bank)
        Bb = wtape._bucket(B, 16)
        n = 1 << elog
        rows = rng.integers(0, (1 << 31) - 1, size=(Bb, n), dtype=np.uint32)
        rows_dev = jnp.asarray(rows)
        # scan-path reference on the SAME prepared rows
        got_pallas = np.asarray(
            wtape_pallas.run_plan(rows_dev, consts, plan, elog)
        )
        # scan kernel expects bucketed dims + device instr arrays
        S, W = plan.n_steps, plan.width
        Sb = wtape._bucket(S, 16)
        n_out = len(plan.out_regs)
        ob = wtape._bucket(n_out, 4)
        R = wtape._bucket(plan.n_regs, 16)
        opc, ia, ib, dst = plan.opc, plan.ia, plan.ib, plan.dst
        if Sb > S:
            pad_opc = np.full((Sb - S, W), 0 * 9 + 2 * 3 + 2, np.int32)
            zeros = np.zeros((Sb - S, W), np.int32)
            opc = np.concatenate([opc, pad_opc])
            ia = np.concatenate([ia, zeros])
            ib = np.concatenate([ib, zeros])
            dst = np.concatenate([dst, zeros])
        out_regs = plan.out_regs
        if ob > n_out:
            out_regs = np.concatenate([out_regs, np.zeros(ob - n_out, np.int32)])
        fn = wtape._wide_kernel(Bb, Sb, W, R, ob, elog, 1)
        want = np.asarray(fn(
            rows_dev, jnp.asarray(consts), jnp.asarray(opc), jnp.asarray(ia),
            jnp.asarray(ib), jnp.asarray(dst), jnp.asarray(out_regs),
        ))[:n_out]
        np.testing.assert_array_equal(got_pallas, want)
    finally:
        set_production_scale()
