"""The real prover on an 8-device CPU mesh (VERDICT r2 item #2).

Shards every trace/preprocessed/interaction stack over the mesh's domain
axis and proves an executed fibonacci program end-to-end; the sharded proof
must be byte-identical to the single-device proof (all kernels are exact
uint32 modular arithmetic — sharding may change the schedule, never the
values) and must verify.

Also cross-checks the explicit shard_map building blocks in parallel/mesh.py
against their unsharded equivalents.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cairo_m_tpu.compiler import compile_cairo
from cairo_m_tpu.field import m31
from cairo_m_tpu.isa.abi_codec import InputValue
from cairo_m_tpu.parallel.mesh import make_mesh, psum_mod, sharded_logup_total
from cairo_m_tpu.parallel.sharded import (
    make_row_mesh,
    maybe_shard,
    prover_mesh,
)
from cairo_m_tpu.prover.adapter.adapter import import_from_runner_output
from cairo_m_tpu.prover.config import (
    set_production_scale,
    set_test_scale,
    test_config,
)
from cairo_m_tpu.prover.prove import prove_cairo_m
from cairo_m_tpu.prover.verify import verify_cairo_m
from cairo_m_tpu.vm.runner import run_cairo_program

P = (1 << 31) - 1

FIB = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""


@pytest.fixture(scope="module", autouse=True)
def _test_scale():
    set_test_scale(rc_big_bits=10, bitwise_log=8)
    yield
    set_production_scale()


@pytest.fixture(scope="module")
def prover_input():
    program = compile_cairo(FIB).program
    res = run_cairo_program(program, "main", [InputValue.number(20)])
    return import_from_runner_output(
        res.vm.segments[0], res.public_address_ranges
    )


def test_sharded_prove_bitexact_and_verifies(prover_input):
    cfg = test_config(n_queries=8, pow_bits=2)
    mesh = make_row_mesh(8)
    with prover_mesh(mesh):
        sharded = prove_cairo_m(prover_input, cfg)
    assert verify_cairo_m(sharded, cfg)
    single = prove_cairo_m(prover_input, cfg)
    assert json.dumps(sharded.to_json_obj(), sort_keys=True) == json.dumps(
        single.to_json_obj(), sort_keys=True
    )


def test_maybe_shard_places_on_mesh():
    mesh = make_row_mesh(8)
    x = jnp.zeros((3, 1 << 10), jnp.uint32)
    with prover_mesh(mesh):
        y = maybe_shard(x)
        assert len(y.sharding.device_set) == 8
        # non-divisible trailing axes stay replicated
        z = maybe_shard(jnp.zeros((3, 7), jnp.uint32))
        assert len(z.sharding.device_set) in (1, 8)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    assert maybe_shard(x) is x  # no-op outside the context


@pytest.mark.slow
def test_sharded_production_scale_100k_bitexact():
    """VERDICT r4 next #4: a >=100k-cycle trace proved at the PRODUCTION
    protocol scale (rc20 = 2^20, bitwise 2^18 — the real commit floor)
    under the 8-device mesh, byte-identical to single-device.  The reduced
    query count only shrinks the query phase; every committed column, FFT,
    Merkle tree and LogUp sum runs at full production shape."""
    from cairo_m_tpu.prover.adapter.native_import import native_prover_input

    set_production_scale()
    try:
        program = compile_cairo(FIB).program
        pi = native_prover_input(program, "main", [13000])  # 104,010 cycles
        assert pi.total_steps >= 100_000
        cfg = test_config(n_queries=8, pow_bits=2)
        mesh = make_row_mesh(8)
        with prover_mesh(mesh):
            sharded = prove_cairo_m(pi, cfg)
        assert verify_cairo_m(sharded, cfg)
        single = prove_cairo_m(pi, cfg)
        assert json.dumps(sharded.to_json_obj(), sort_keys=True) == json.dumps(
            single.to_json_obj(), sort_keys=True
        )
    finally:
        set_test_scale(rc_big_bits=10, bitwise_log=8)


def test_psum_mod_matches_host():
    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    parts = rng.integers(0, P, size=(16, 4), dtype=np.uint32)
    total = sharded_logup_total(mesh)(jnp.asarray(parts))
    want = parts.astype(np.uint64).sum(axis=0) % P
    np.testing.assert_array_equal(np.asarray(total), want.astype(np.uint32))
