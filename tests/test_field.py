"""Field arithmetic tests: jax uint32 path vs NumPy uint64 golden path,
plus algebraic identities (associativity, inverses, extension tower)."""

import numpy as np
import jax.numpy as jnp

from cairo_m_tpu.field import m31, qm31

P = m31.P
RNG = np.random.default_rng(0)


def rand_m31(n):
    return RNG.integers(0, P, size=n, dtype=np.uint32)


def test_m31_add_sub_matches_numpy():
    a, b = rand_m31(4096), rand_m31(4096)
    np.testing.assert_array_equal(np.asarray(m31.add(a, b)), m31.add_np(a, b))
    np.testing.assert_array_equal(np.asarray(m31.sub(a, b)), m31.sub_np(a, b))
    np.testing.assert_array_equal(np.asarray(m31.neg(a)), m31.neg_np(a))


def test_m31_mul_matches_numpy():
    a, b = rand_m31(65536), rand_m31(65536)
    np.testing.assert_array_equal(np.asarray(m31.mul(a, b)), m31.mul_np(a, b))


def test_m31_mul_edge_cases():
    edge = np.array([0, 1, 2, P - 1, P - 2, 1 << 30, (1 << 30) - 1, 12345], dtype=np.uint32)
    aa, bb = np.meshgrid(edge, edge)
    aa, bb = aa.ravel(), bb.ravel()
    np.testing.assert_array_equal(np.asarray(m31.mul(aa, bb)), m31.mul_np(aa, bb))


def test_m31_inv():
    a = rand_m31(1024)
    a[0] = 1
    a[1] = P - 1
    got = np.asarray(m31.inv(jnp.asarray(a)))
    check = m31.mul_np(a, got)
    np.testing.assert_array_equal(check, np.ones_like(a))
    # host inverse agrees
    np.testing.assert_array_equal(got, m31.inv_np(a))


def test_m31_batch_inv_np():
    a = rand_m31(257)
    a[3] = 0  # zero passes through as zero
    out = m31.batch_inv_np(a)
    assert out[3] == 0
    nz = a != 0
    np.testing.assert_array_equal(m31.mul_np(a[nz], out[nz]), np.ones(nz.sum(), np.uint32))


def rand_qm31(n):
    return tuple(rand_m31(n) for _ in range(4))


def test_qm31_mul_matches_numpy():
    x, y = rand_qm31(4096), rand_qm31(4096)
    got = qm31.qmul(tuple(map(jnp.asarray, x)), tuple(map(jnp.asarray, y)))
    want = qm31.qmul_np(x, y)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_qm31_field_axioms():
    x, y, z = rand_qm31(512), rand_qm31(512), rand_qm31(512)
    jx = tuple(map(jnp.asarray, x))
    jy = tuple(map(jnp.asarray, y))
    jz = tuple(map(jnp.asarray, z))
    # associativity & commutativity & distributivity
    lhs = qm31.qmul(qm31.qmul(jx, jy), jz)
    rhs = qm31.qmul(jx, qm31.qmul(jy, jz))
    for a, b in zip(lhs, rhs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    lhs = qm31.qmul(jx, qm31.qadd(jy, jz))
    rhs = qm31.qadd(qm31.qmul(jx, jy), qm31.qmul(jx, jz))
    for a, b in zip(lhs, rhs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qm31_inv():
    x = rand_qm31(512)
    jx = tuple(map(jnp.asarray, x))
    xi = qm31.qinv(jx)
    prod = qm31.qmul(jx, xi)
    one = qm31.qone_like(jx)
    for a, b in zip(prod, one):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # numpy version agrees
    xin = qm31.qinv_np(x)
    for a, b in zip(xi, xin):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_qm31_nonresidue_tower():
    # u^2 = 2 + i: (0,0,1,0)^2 == (2,1,0,0)
    u = tuple(jnp.asarray(np.array([v], dtype=np.uint32)) for v in (0, 0, 1, 0))
    u2 = qm31.qmul(u, u)
    got = [int(np.asarray(c)[0]) for c in u2]
    assert got == [2, 1, 0, 0]


def test_m31_mul_limb_path_matches_u64_path():
    """The TPU uint32 limb path must stay covered even when tests run with
    x64 enabled (CPU fast path)."""
    import jax

    a, b = rand_m31(4096), rand_m31(4096)
    with jax.enable_x64(False):
        got = np.asarray(jax.jit(m31.mul)(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, m31.mul_np(a, b))
