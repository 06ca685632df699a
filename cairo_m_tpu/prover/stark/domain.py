"""Circle group over M31, canonic cosets, twiddles, and domain orderings.

The unit circle x^2 + y^2 = 1 over M31 is a cyclic group of order 2^31
(point addition (x1,y1)+(x2,y2) = (x1x2 - y1y2, x1y2 + y1x2)).  This module
is the TPU-native equivalent of stwo's `core::{circle, poly::circle}`
(consumed by the reference prover per SURVEY.md §2.9):

- points are indexed by integers mod 2^31 (multiples of the generator);
- the **canonic coset** of size 2^n is the set of odd multiples of
  2^(30-n): row i of a trace maps to point ``(2i+1) * 2^(30-n)``;
- the same point set, viewed as the twin coset ``H ∪ -H`` with
  ``H = {(4k+1)*2^(30-n)}``, is the **FFT/commit order** this framework
  stores evaluations in.  Row order <-> FFT order is pure slicing:
  ``fft = concat(rows[0::2], rows[1::2][::-1])`` (no bit-reversal gathers,
  so the layout is XLA-fusion friendly);
- the circle FFT pairs index i with i + len/2 at every level, with
  y-twiddles at the first level and x-twiddles of repeatedly-doubled
  cosets after (Haböck-Levit-Papini circle STARKs construction);
- the vanishing polynomial of the size-2^n canonic domain is
  ``V_n(p) = pi^(n-1)(x_p)`` with ``pi(x) = 2x^2 - 1``; on the blowup-2
  commit domain, a trace-row offset of ``k`` becomes an index offset of
  ``2k`` in row order.

Host (NumPy) computes index tables and twiddles once per log_size (cached);
all hot math consumes them as device arrays.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ...field import m31
from ...field.qm31 import qadd, qinv, qmul, qsub

P = (1 << 31) - 1
M31_CIRCLE_LOG_ORDER = 31

# Generator of the full 2^31-order circle group (x=2, y solves y^2 = -3).
CIRCLE_GEN = (2, 1268011823)


# ---------------------------------------------------------------------------
# Host point arithmetic (Python ints — setup only)
# ---------------------------------------------------------------------------


def point_add(a, b):
    return (
        (a[0] * b[0] - a[1] * b[1]) % P,
        (a[0] * b[1] + a[1] * b[0]) % P,
    )


def point_neg(a):
    return (a[0], (-a[1]) % P)


def point_double(a):
    return point_add(a, a)


@lru_cache(maxsize=None)
def point_at_index(index: int):
    """index -> index * CIRCLE_GEN (double-and-add)."""
    index %= 1 << M31_CIRCLE_LOG_ORDER
    result = (1, 0)
    base = CIRCLE_GEN
    while index:
        if index & 1:
            result = point_add(result, base)
        base = point_double(base)
        index >>= 1
    return result


def subgroup_gen_index(log_size: int) -> int:
    """Index of the generator of the size-2^log_size subgroup."""
    return 1 << (M31_CIRCLE_LOG_ORDER - log_size)


# ---------------------------------------------------------------------------
# Canonic coset tables
# ---------------------------------------------------------------------------


def _point_add_np(ax, ay, b):
    """Vectorized (ax, ay) + scalar point b over M31 (uint32 arrays)."""
    bx, by = np.uint32(b[0]), np.uint32(b[1])
    return (
        m31.sub_np(m31.mul_np(ax, bx), m31.mul_np(ay, by)),
        m31.add_np(m31.mul_np(ax, by), m31.mul_np(ay, bx)),
    )


@lru_cache(maxsize=None)
def coset_points(log_size: int):
    """(x, y) uint32 arrays for the canonic coset of size 2^log_size in
    **row order**: row i -> point (2i+1) * 2^(30-log_size).

    Built in O(log n) vectorized doublings: arr_{t+1} = arr_t ++ (arr_t + 2^t*step).
    """
    n = 1 << log_size
    step_index = subgroup_gen_index(log_size)  # 2^(31-log_size)
    start = point_at_index(subgroup_gen_index(log_size + 1))
    xs = np.array([start[0]], dtype=np.uint32)
    ys = np.array([start[1]], dtype=np.uint32)
    for t in range(log_size):
        shift = point_at_index((step_index << t) % (1 << 31))
        nx, ny = _point_add_np(xs, ys, shift)
        xs = np.concatenate([xs, nx])
        ys = np.concatenate([ys, ny])
    return xs, ys


def to_fft_order(v):
    """Row order -> FFT order ([H; -H] twin-coset layout), on the LAST axis
    (leading axes batch; works on NumPy or JAX arrays)."""
    import jax.numpy as jnp

    xp = jnp if not isinstance(v, np.ndarray) else np
    return xp.concatenate([v[..., 0::2], v[..., 1::2][..., ::-1]], axis=-1)


def from_fft_order(v):
    """Inverse of to_fft_order (last axis)."""
    import jax.numpy as jnp

    n = v.shape[-1]
    m = n // 2
    xp = jnp if not isinstance(v, np.ndarray) else np
    out_even = v[..., :m]
    out_odd = v[..., m:][..., ::-1]
    stacked = xp.stack([out_even, out_odd], axis=-1)
    return stacked.reshape(v.shape[:-1] + (n,))


@lru_cache(maxsize=None)
def fft_twiddles(log_size: int):
    """Per-level twiddles for the circle FFT on the size-2^log_size canonic
    domain, in FFT order.

    Returns (levels, inv_levels): ``levels[0]`` = y-coords of H (size n/2),
    ``levels[j>=1]`` = x-coords after j-1 doublings (size n/2^(j+1)), each in
    the FFT order of its own level; ``inv_levels`` are elementwise inverses
    (for the inverse FFT), with the 1/2 butterfly normalization folded in
    separately by the caller.
    """
    n = 1 << log_size
    xs, ys = coset_points(log_size)
    # FFT order of the domain
    fx = to_fft_order(xs)
    fy = to_fft_order(ys)
    m = n // 2
    levels = [fy[:m].copy()]  # y-twiddles: y of H points
    cur_x = fx[:m].copy()  # x of H
    size = m
    while size > 1:
        levels.append(cur_x[: size // 2].copy())
        # doubled coset x-coords: pi(x) = 2x^2 - 1 of the first half
        cur_x = (
            (2 * cur_x[: size // 2].astype(np.uint64) ** 2 - 1) % P
        ).astype(np.uint32)
        size //= 2
    inv_levels = [m31.inv_np(lv) for lv in levels]
    return levels, inv_levels


@lru_cache(maxsize=None)
def vanishing_on_domain(trace_log_size: int, eval_log_size: int):
    """V_{trace}(p) for p over the size-2^eval_log_size canonic domain
    (row order): pi^(trace_log_size - 1)(x_p).  Returns (values, inverses)
    as uint32 arrays."""
    xs, _ = coset_points(eval_log_size)
    v = xs.astype(np.uint64)
    for _ in range(trace_log_size - 1):
        v = (2 * v * v - 1) % P
    v = v.astype(np.uint32)
    return v, m31.inv_np(v)


# ---------------------------------------------------------------------------
# Commit order: bit-reversed FFT order
# ---------------------------------------------------------------------------
# FRI folding pairs (i, i + len/2) of the FFT order become *adjacent* leaf
# pairs (2q, 2q+1) under bit reversal, at every folding level; a query then
# opens both pair elements as Merkle siblings sharing their whole path.


@lru_cache(maxsize=None)
def bitrev_indices(log_size: int) -> np.ndarray:
    n = 1 << log_size
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_size):
        rev |= ((idx >> b) & 1) << (log_size - 1 - b)
    return rev


def bit_reverse(v, log_size: int):
    """Permute the LAST axis by bit reversal (involution).

    Device path avoids a 2^L element gather (near scalar speed on TPU):
    with i = a*B + b (a: LA bits, b: LB bits), rev(i) = rev_B(b)*A +
    rev_A(a), so the permutation factors into two LEADING-axis row takes
    (contiguous block copies) around one transpose:
    out.reshape(A, B)[a, b] = v.reshape(B, A)[rev_B(b), rev_A(a)].
    """
    import jax.numpy as jnp

    rev = bitrev_indices(log_size)
    if isinstance(v, np.ndarray):
        return v[..., rev]
    if log_size <= 10:
        return jnp.take(v, jnp.asarray(rev), axis=-1)
    LA = log_size // 2
    LB = log_size - LA
    A, B = 1 << LA, 1 << LB
    lead = v.shape[:-1]
    t = v.reshape(lead + (B, A))
    t = jnp.take(t, jnp.asarray(bitrev_indices(LB).astype(np.int32)), axis=-2)
    t = jnp.swapaxes(t, -1, -2)  # (A, B)
    t = jnp.take(t, jnp.asarray(bitrev_indices(LA).astype(np.int32)), axis=-2)
    return t.reshape(lead + (1 << log_size,))


def to_commit_order(rows, log_size: int):
    """Trace rows (natural row order) -> commit order (bitrev of FFT order)."""
    return bit_reverse(to_fft_order(rows), log_size)


def commit_pos_to_row(pos: int, log_size: int) -> int:
    """Commit-order position -> trace row index (host, per-query)."""
    n, m = 1 << log_size, 1 << (log_size - 1)
    f = int(bitrev_indices(log_size)[pos])
    if f < m:
        return 2 * f
    return n - 1 - 2 * (f - m)


def commit_pos_point(pos: int, log_size: int):
    """Circle point (M31 pair) at a commit-order position."""
    row = commit_pos_to_row(pos, log_size)
    return point_at_index((2 * row + 1) * subgroup_gen_index(log_size + 1))


@lru_cache(maxsize=None)
def fri_twiddles_bitrev(log_size: int):
    """Inverse twiddles for FRI folding on commit-order arrays.

    Returns [t_0, t_1, ...]: t_0 = 1/y over H bit-reversed (circle->line
    fold), t_j (j>=1) = 1/x over the level-j line domain bit-reversed.
    Folding at level j pairs positions (2q, 2q+1) with twiddle index q.
    """
    _, inv_levels = fft_twiddles(log_size)
    out = []
    for j, lv in enumerate(inv_levels):
        lg = log_size - 1 - j
        assert lv.shape[0] == 1 << lg
        out.append(bit_reverse(lv, lg))
    return out


# ---------------------------------------------------------------------------
# QM31 (secure-field) points — for OODS
# ---------------------------------------------------------------------------


def qpoint_from_t(t):
    """Map a QM31 scalar t to a circle point over QM31 via the rational
    parametrization p = ((1-t^2)/(1+t^2), 2t/(1+t^2))."""
    one = tuple(np.array([1, 0, 0, 0], dtype=np.uint32)[i] * np.ones_like(t[0]) for i in range(4))
    t2 = qmul(t, t)
    denom = qinv(qadd(one, t2))
    x = qmul(qsub(one, t2), denom)
    y = qmul(qadd(t, t), denom)
    return (x, y)


def qpoint_add(a, b):
    ax, ay = a
    bx, by = b
    return (
        qsub(qmul(ax, bx), qmul(ay, by)),
        qadd(qmul(ax, by), qmul(ay, bx)),
    )


def qpoint_neg(a):
    from ...field.qm31 import qneg

    return (a[0], qneg(a[1]))


def qpoint_at_index_embedded(index: int):
    """Base-field point at `index`, embedded into QM31 limb tuples of shape ()."""
    x, y = point_at_index(index)

    def emb(v):
        return tuple(np.uint32(v if i == 0 else 0) for i in range(4))

    return (emb(x), emb(y))
