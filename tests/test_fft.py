"""Circle domain + FFT tests: group structure, orderings, transform
roundtrips, degree embedding, and OODS point evaluation."""

import numpy as np
import jax
import jax.numpy as jnp

from cairo_m_tpu.field import m31
from cairo_m_tpu.prover.stark import domain, fft

P = (1 << 31) - 1
RNG = np.random.default_rng(5)


def test_generator_order():
    g = domain.CIRCLE_GEN
    assert (g[0] * g[0] + g[1] * g[1]) % P == 1
    half = domain.point_at_index(1 << 30)
    assert half == (P - 1, 0)  # order-2 point
    assert domain.point_at_index(0) == (1, 0)
    q = domain.point_at_index(1 << 29)
    assert q[0] == 0  # order-4 point has x = 0


def test_coset_points_on_circle_and_distinct():
    xs, ys = domain.coset_points(8)
    lhs = m31.add_np(m31.mul_np(xs, xs), m31.mul_np(ys, ys))
    np.testing.assert_array_equal(lhs, np.ones(256, np.uint32))
    assert len({(int(a), int(b)) for a, b in zip(xs, ys)}) == 256
    # row i point = (2i+1) * 2^(30-log)
    for i in (0, 1, 17, 255):
        want = domain.point_at_index((2 * i + 1) * (1 << (30 - 8)))
        assert (int(xs[i]), int(ys[i])) == want


def test_fft_order_roundtrip():
    v = np.arange(64, dtype=np.uint32)
    f = domain.to_fft_order(v)
    np.testing.assert_array_equal(np.asarray(domain.from_fft_order(f)), v)
    # twin-coset structure: position m+k holds the negation of position k
    xs, ys = domain.coset_points(6)
    fx, fy = domain.to_fft_order(xs), domain.to_fft_order(ys)
    np.testing.assert_array_equal(fx[32:], fx[:32])
    np.testing.assert_array_equal(fy[32:], m31.neg_np(fy[:32]))


def test_ifft_fft_roundtrip():
    log = 10
    v = RNG.integers(0, P, size=(3, 1 << log), dtype=np.uint32)
    coeffs = fft.ifft(jnp.asarray(v), log)
    back = np.asarray(fft.fft(coeffs, log))
    np.testing.assert_array_equal(back, v)


def test_vanishing_polynomial():
    # V_n vanishes on the size-2^n domain and not on the 2^(n+1) one
    v_on_self = domain.vanishing_on_domain(6, 6)[0]
    np.testing.assert_array_equal(v_on_self, np.zeros(64, np.uint32))
    v_ext, v_ext_inv = domain.vanishing_on_domain(6, 7)
    assert (v_ext != 0).all()
    np.testing.assert_array_equal(m31.mul_np(v_ext, v_ext_inv), np.ones(128, np.uint32))


def test_lde_preserves_low_degree():
    """LDE evaluations must interpolate back with top coefficients zero."""
    log, elog = 6, 8
    v = RNG.integers(0, P, size=(1 << log,), dtype=np.uint32)
    ext = fft.lde(jnp.asarray(v), log, elog)
    # interpolate on the big domain: only embedded indices may be nonzero
    big_coeffs = np.asarray(fft.ifft(ext, elog))
    mask = np.ones(1 << elog, bool)
    mask[:: 1 << (elog - log)] = False
    np.testing.assert_array_equal(big_coeffs[mask], 0)
    # and the embedded ones equal the small-domain coefficients
    small_coeffs = np.asarray(fft.ifft(jnp.asarray(v), log))
    np.testing.assert_array_equal(big_coeffs[:: 1 << (elog - log)], small_coeffs)


def test_eval_at_embedded_base_point_matches_fft():
    """eval_at_qpoint at a real domain point must equal the FFT evaluation."""
    log = 7
    v = RNG.integers(0, P, size=(1 << log,), dtype=np.uint32)
    coeffs = fft.ifft(jnp.asarray(v), log)
    xs, ys = domain.coset_points(log)
    fft_vals = v  # values are in fft order: index k of input corresponds to...
    # pick row 5: its fft-order position is 5//2 if even else m + (n-1-5)//2
    for row in (0, 1, 5, 126):
        n, m = 1 << log, 1 << (log - 1)
        pos = row // 2 if row % 2 == 0 else m + (n - 1 - row) // 2
        qp = tuple(
            (jnp.asarray(np.array(c, dtype=np.uint32)),) + tuple(jnp.zeros((), jnp.uint32) for _ in range(3))
            for c in (0,)
        )
        # embed base point (xs[row], ys[row]) into QM31
        def emb(c):
            return (jnp.uint32(c), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0))

        got = fft.eval_at_qpoint(coeffs, log, (emb(int(xs[row])), emb(int(ys[row]))))
        got0 = int(np.asarray(got[0]))
        rest = [int(np.asarray(g)) for g in got[1:]]
        assert rest == [0, 0, 0]
        assert got0 == int(np.asarray(fft_vals)[pos] if isinstance(fft_vals, jnp.ndarray) else fft_vals[pos])


def test_offset_shift_on_extended_domain():
    """Trace-row offset -1 equals index offset -blowup on the extended domain:
    evaluate a polynomial and its shift, compare."""
    log, elog = 5, 6
    v = RNG.integers(0, P, size=(1 << log,), dtype=np.uint32)
    # f_shift(row i) := f(row i-1) on the trace domain (row order)
    rows = np.asarray(domain.from_fft_order(jnp.asarray(v)))
    rows_shift = np.roll(rows, 1)
    ext = np.asarray(
        domain.from_fft_order(fft.lde(domain.to_fft_order(jnp.asarray(rows)), log, elog))
    )
    ext_shift = np.asarray(
        domain.from_fft_order(fft.lde(domain.to_fft_order(jnp.asarray(rows_shift)), log, elog))
    )
    np.testing.assert_array_equal(ext_shift, np.roll(ext, 2))
