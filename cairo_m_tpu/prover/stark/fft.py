"""Circle FFT / iFFT over M31 — the prover's core transform.

Operates on evaluations stored in **FFT order** (see `domain.py`): level j
butterflies pair contiguous half-blocks (i, i + len/2), so every level is a
reshape + elementwise op — no gathers, fully fusable by XLA, and the leading
axes batch arbitrarily many columns.

Coefficients come out in the circle-FFT basis
``b_j = y^{j0} * x^{j1} * pi(x)^{j2} * ... , pi(x) = 2x^2 - 1`` with the
y-bit as the index MSB and deeper pi-powers toward the LSB.  That indexing
makes degree embedding trivial: a size-2^L coefficient vector embeds into a
size-2^L' one at indices ``i << (L' - L)`` (zero elsewhere), which is how
`lde` performs the low-degree extension.

Equivalent of stwo's `core::poly::circle::{CirclePoly, CircleEvaluation,
PolyOps}` + `core::backend::simd::fft` (SURVEY.md §2.9), re-designed for
TPU: trailing-axis layout, uint32 limb math from `field.m31`.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ...field import m31
from ...field.qm31 import qadd, qmul, qmul_m31
from . import domain

P = (1 << 31) - 1


def _twiddles_dev(log_size: int, inverse: bool):
    """Twiddles as fresh constants per call (host-cached NumPy underneath).
    Inside a jitted caller these become HLO constant literals baked into the
    executable — fine at test sizes, ~2^log_size words of HBM *per compiled
    graph* at production sizes.  Hot paths must instead thread
    `twiddles_dev` results through as explicit jit arguments."""
    levels, inv_levels = domain.fft_twiddles(log_size)
    src = inv_levels if inverse else levels
    return [jnp.asarray(t) for t in src]


@lru_cache(maxsize=None)
def twiddles_dev(log_size: int, inverse: bool):
    """Concrete device-resident twiddle levels, uploaded once per process.
    Pass these as *arguments* to jitted functions (pytree of per-level
    arrays) so large twiddles are shared across executables instead of being
    duplicated as constant literals in each (the round-3 fib-1M HBM OOM:
    dozens of 4-64 MB `constant literal` allocations)."""
    levels, inv_levels = domain.fft_twiddles(log_size)
    src = inv_levels if inverse else levels
    return tuple(jnp.asarray(t) for t in src)


# Two-stage butterfly layout.  A naive level loop keeps the butterfly pair
# axis on the LAST (lane) dimension; once the block half-size drops below
# the 128-lane VPU tile every op runs at a fraction of lane width —
# measured 9 s for ONE 2^20 column on TPU v5e.  Levels are instead split at
# 2^_SPLIT_LOG: outer levels pair whole rows of an (n1, n2) matrix view
# (last axis stays n2), then ONE transpose moves the within-row levels onto
# the leading axis (last axis becomes n1).  Every elementwise op keeps a
# >= 2^_SPLIT_LOG trailing dim; the transposes run at memory bandwidth.
_SPLIT_LOG = 9


def _pad_lead(v):
    """Pad the leading (batch) axis to a multiple of 8 around the two-stage
    transposes.  XLA TPU MISCOMPILES the jitted (k, n1, n2) swapaxes chain
    for some non-multiple-of-8 k — observed at (12, 2^19) and (13, 2^19):
    the LAST batch column comes back corrupted (zeros), while 8/16/48 are
    fine (bisected on hardware; the corrupt commitment surfaced as a
    CPU-vs-TPU proof byte diff).  EVERY input takes the pad (1-D promoted to
    k=1 first) — the bug was bisected at k=12/13 but never ruled out for
    other non-multiple-of-8 k (ADVICE r4 #1) — and >=3-D batches fail loudly
    instead of passing through unguarded.  Returns (padded, original_k; 0
    means the input was 1-D)."""
    assert v.ndim <= 2, "two-stage FFT path expects (n,) or (k, n) inputs"
    orig_k = 0 if v.ndim == 1 else v.shape[0]
    if v.ndim == 1:
        v = v[None]
    k = v.shape[0]
    if k % 8:
        kp = (k + 7) // 8 * 8
        pad = jnp.zeros((kp - k,) + v.shape[1:], v.dtype)
        v = jnp.concatenate([v, pad], axis=0)
    return v, orig_k


def ifft(values, log_size: int, itw=None):
    """Evaluations (..., 2^log_size) in FFT order -> coefficients.

    The 1/2 butterfly normalizations are batched into one final 2^-L scale.
    ``itw``: optional inverse twiddle levels (see `twiddles_dev`).
    """
    v = values
    n = 1 << log_size
    assert v.shape[-1] == n
    if itw is None:
        itw = _twiddles_dev(log_size, inverse=True)
    lead = v.shape[:-1]
    if log_size <= _SPLIT_LOG:
        for j in range(log_size):
            half = n >> (j + 1)
            v = v.reshape(lead + (1 << j, 2, half))
            a = v[..., 0, :]
            b = v[..., 1, :]
            f0 = m31.add(a, b)
            f1 = m31.mul(m31.sub(a, b), itw[j])
            v = jnp.stack([f0, f1], axis=-2)
        v = v.reshape(lead + (n,))
        scale = pow((P + 1) // 2, log_size, P)
        return m31.mul(v, jnp.uint32(scale))
    v, orig_k = _pad_lead(v)
    lead = v.shape[:-1]
    L2 = _SPLIT_LOG
    L1 = log_size - L2
    n1, n2 = 1 << L1, 1 << L2
    # outer levels: pair distance >= n2 -> butterflies across rows
    for j in range(L1):
        rows = n1 >> (j + 1)
        v = v.reshape(lead + (1 << j, 2, rows, n2))
        a = v[..., 0, :, :]
        b = v[..., 1, :, :]
        f0 = m31.add(a, b)
        f1 = m31.mul(m31.sub(a, b), itw[j].reshape(rows, n2))
        v = jnp.stack([f0, f1], axis=-3)
    v = jnp.swapaxes(v.reshape(lead + (n1, n2)), -1, -2)
    # inner levels: within-row folds, now on the leading structure axis
    for j in range(L1, log_size):
        half = n >> (j + 1)
        blocks = n2 // (2 * half)
        v = v.reshape(lead + (blocks, 2, half, n1))
        a = v[..., 0, :, :]
        b = v[..., 1, :, :]
        f0 = m31.add(a, b)
        f1 = m31.mul(m31.sub(a, b), itw[j].reshape(half, 1))
        v = jnp.stack([f0, f1], axis=-3)
    v = jnp.swapaxes(v.reshape(lead + (n2, n1)), -1, -2).reshape(lead + (n,))
    v = v[0] if orig_k == 0 else v[:orig_k]
    scale = pow((P + 1) // 2, log_size, P)  # 2^-log_size
    return m31.mul(v, jnp.uint32(scale))


def fft(coeffs, log_size: int, tw=None):
    """Coefficients -> evaluations (..., 2^log_size) in FFT order.
    ``tw``: optional twiddle levels (see `twiddles_dev`)."""
    v = coeffs
    n = 1 << log_size
    assert v.shape[-1] == n
    if tw is None:
        tw = _twiddles_dev(log_size, inverse=False)
    lead = v.shape[:-1]
    if log_size <= _SPLIT_LOG:
        for j in range(log_size - 1, -1, -1):
            half = n >> (j + 1)
            v = v.reshape(lead + (1 << j, 2, half))
            a = v[..., 0, :]
            b = m31.mul(v[..., 1, :], tw[j])
            v = jnp.stack([m31.add(a, b), m31.sub(a, b)], axis=-2)
        return v.reshape(lead + (n,))
    v, orig_k = _pad_lead(v)
    lead = v.shape[:-1]
    L2 = _SPLIT_LOG
    L1 = log_size - L2
    n1, n2 = 1 << L1, 1 << L2
    # inner levels first (j = log_size-1 .. L1): within-row, transposed view
    v = jnp.swapaxes(v.reshape(lead + (n1, n2)), -1, -2)
    for j in range(log_size - 1, L1 - 1, -1):
        half = n >> (j + 1)
        blocks = n2 // (2 * half)
        v = v.reshape(lead + (blocks, 2, half, n1))
        a = v[..., 0, :, :]
        b = m31.mul(v[..., 1, :, :], tw[j].reshape(half, 1))
        v = jnp.stack([m31.add(a, b), m31.sub(a, b)], axis=-3)
    v = jnp.swapaxes(v.reshape(lead + (n2, n1)), -1, -2)
    # outer levels (j = L1-1 .. 0): across rows
    for j in range(L1 - 1, -1, -1):
        rows = n1 >> (j + 1)
        v = v.reshape(lead + (1 << j, 2, rows, n2))
        a = v[..., 0, :, :]
        b = m31.mul(v[..., 1, :, :], tw[j].reshape(rows, n2))
        v = jnp.stack([m31.add(a, b), m31.sub(a, b)], axis=-3)
    v = v.reshape(lead + (n,))
    return v[0] if orig_k == 0 else v[:orig_k]


def lde(values_fft_order, log_size: int, eval_log_size: int):
    """Low-degree extension: evaluations on the size-2^log_size canonic
    domain -> evaluations on the size-2^eval_log_size one (both FFT order)."""
    coeffs = ifft(values_fft_order, log_size)
    return fft(embed_coeffs(coeffs, log_size, eval_log_size), eval_log_size)


def embed_coeffs(coeffs, log_size: int, eval_log_size: int):
    """Embed a coefficient vector into the bigger basis (index << gap)."""
    gap = eval_log_size - log_size
    assert gap >= 0
    if gap == 0:
        return coeffs
    lead = coeffs.shape[:-1]
    n = 1 << log_size
    big = jnp.zeros(lead + (n, 1 << gap), dtype=coeffs.dtype)
    big = big.at[..., 0].set(coeffs)
    return big.reshape(lead + (1 << eval_log_size,))


# ---------------------------------------------------------------------------
# Point evaluation (OODS) — coefficients x QM31 circle point
# ---------------------------------------------------------------------------


def point_eval_twiddles(qpoint, log_size: int):
    """QM31 twiddle scalars [t_0 .. t_{L-1}] for evaluating a size-2^L
    coefficient vector at a QM31 circle point: t_0 = y, t_1 = x,
    t_j = pi^(j-1)(x)."""
    x, y = qpoint
    tws = [y]
    cur = x
    for _ in range(log_size - 1):
        tws.append(cur)
        # pi(x) = 2x^2 - 1
        two = qadd(cur, cur)
        sq = qmul(two, cur)
        one = tuple(
            jnp.full_like(sq[0], 1 if k == 0 else 0) for k in range(4)
        )
        cur = tuple(m31.sub(sq[k], one[k]) for k in range(4))
    return tws


def eval_at_qpoint(coeffs, log_size: int, qpoint):
    """Evaluate an M31 coefficient vector (..., 2^L) at a QM31 point.

    Folds from the innermost level outward: v <- v[..., 0::2] + t_j*v[..., 1::2]
    reshaped as contiguous pairs.  Returns a QM31 limb tuple of shape (...,).
    """
    tws = point_eval_twiddles(qpoint, log_size)
    lead = coeffs.shape[:-1]
    # lift to QM31 limbs
    v = (coeffs,) + tuple(jnp.zeros_like(coeffs) for _ in range(3))
    for j in range(log_size - 1, -1, -1):
        half = v[0].shape[-1] // 2
        a = tuple(c.reshape(lead + (half, 2))[..., 0] for c in v)
        b = tuple(c.reshape(lead + (half, 2))[..., 1] for c in v)
        v = qadd(a, qmul(b, tws[j]))
    return tuple(c[..., 0] for c in v)


def point_eval_twiddles_host(qpoint, log_size: int) -> np.ndarray:
    """Host version of point_eval_twiddles for a *scalar* QM31 point:
    returns a (log_size, 4) uint32 array [t_{L-1}, ..., t_0] — innermost fold
    first, ready to feed `eval_at_qpoint_scan` as scan inputs."""
    from .fri import qscalar_mul, qscalar_sub  # host scalar helpers

    x, y = qpoint
    x = tuple(int(v) for v in x)
    y = tuple(int(v) for v in y)
    tws = [y]
    cur = x
    for _ in range(log_size - 1):
        tws.append(cur)
        two = tuple((2 * v) % P for v in cur)
        sq = qscalar_mul(two, cur)
        cur = ((sq[0] - 1) % P,) + tuple(sq[1:])
    return np.array(tws[::-1], dtype=np.uint32)


def eval_at_qpoint_folds(coeffs, log_size: int, tws):
    """Halving fold evaluation: O(n) work (the scan variant below keeps a
    static shape by zero-padding and pays O(n log n) — a 10x+ waste at the
    2^20+ sizes the prover samples).  Graph size ~35*log_size primitives:
    small enough to jit per log_size.

    The evaluation is a multilinear contraction sum_i c[i] prod_j
    t_j^{bit_j(i)}, so bits contract in ANY order: folding the MSB first
    pairs CONTIGUOUS HALVES (a = c[:n/2], b = c[n/2:]) instead of
    adjacent elements — the stride-2/pair-reshape pattern measured ~7-10x
    slower on TPU (lane-shuffle relayouts).

    ``tws``: (log_size, 4) device array from `point_eval_twiddles_host`
    (innermost fold first; consumed here outermost-first)."""
    n = 1 << log_size
    assert coeffs.shape[-1] == n
    z = jnp.zeros_like(coeffs)
    v = (coeffs, z, z, z)
    for j in range(log_size - 1, -1, -1):
        half = v[0].shape[-1] // 2
        a = tuple(c[..., :half] for c in v)
        b = tuple(c[..., half:] for c in v)
        t = tuple(tws[j, k] for k in range(4))
        v = qadd(a, qmul(b, t))
    return tuple(c[..., 0] for c in v)


def eval_at_qpoint_scan(coeffs, log_size: int, tws):
    """Same evaluation with a fixed-shape `lax.scan` over fold levels, so the
    compiled graph is one fold (~200 primitives) instead of log_size folds —
    XLA compile time is superlinear in graph size.

    ``tws``: (log_size, 4) device array from `point_eval_twiddles_host`.
    Each step folds adjacent pairs of the live prefix and zero-pads the tail
    (folding zeros is a no-op), keeping the carry shape static at
    (..., 4, 2^L).  ~2x the FLOPs of the halving loop; negligible next to
    compile time.
    """
    import jax

    n = 1 << log_size
    assert coeffs.shape[-1] == n
    lead = coeffs.shape[:-1]
    zero = jnp.zeros_like(coeffs)
    v = jnp.stack([coeffs, zero, zero, zero], axis=-2)  # (..., 4, n)

    def body(v, t):
        a = v[..., 0::2]
        b = v[..., 1::2]
        tq = tuple(t[k] for k in range(4))
        f = qadd(
            tuple(a[..., k, :] for k in range(4)),
            qmul(tuple(b[..., k, :] for k in range(4)), tq),
        )
        f = jnp.stack(f, axis=-2)  # (..., 4, n/2)
        v = jnp.concatenate([f, jnp.zeros_like(f)], axis=-1)
        return v, None

    v, _ = jax.lax.scan(body, v, tws)
    return tuple(v[..., k, 0] for k in range(4))
