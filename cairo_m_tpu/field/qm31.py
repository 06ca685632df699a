"""CM31 / QM31 extension-field arithmetic over M31.

Tower (matching stwo `core::fields::{cm31,qm31}`, the secure field of the
Cairo-M prover — SURVEY.md §2.9):

- ``CM31 = M31[i] / (i^2 + 1)``          elements ``x0 + x1*i``
- ``QM31 = CM31[u] / (u^2 - (2 + i))``   elements ``A + B*u`` with A, B in CM31

so a QM31 is 4 M31 limbs ``(a, b, c, d) = (a + b*i) + (c + d*i)*u``.
``SECURE_EXTENSION_DEGREE = 4``.

Layout convention: *struct of arrays*.  The public API works on packed
arrays of shape ``(..., 4)`` (uint32) but all internal math runs on the four
unpacked limb arrays so XLA/Pallas never see an awkward trailing dim.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import m31

SECURE_EXTENSION_DEGREE = 4

# R = 2 + i is the QM31 non-residue: u^2 = R.

# ---------------------------------------------------------------------------
# CM31 on limb pairs
# ---------------------------------------------------------------------------


def cm31_add(x, y):
    return (m31.add(x[0], y[0]), m31.add(x[1], y[1]))


def cm31_sub(x, y):
    return (m31.sub(x[0], y[0]), m31.sub(x[1], y[1]))


def cm31_neg(x):
    return (m31.neg(x[0]), m31.neg(x[1]))


def cm31_mul(x, y):
    """(x0 + x1 i)(y0 + y1 i) = (x0y0 - x1y1) + (x0y1 + x1y0) i."""
    x0, x1 = x
    y0, y1 = y
    return (
        m31.sub(m31.mul(x0, y0), m31.mul(x1, y1)),
        m31.add(m31.mul(x0, y1), m31.mul(x1, y0)),
    )


def cm31_mul_m31(x, s):
    return (m31.mul(x[0], s), m31.mul(x[1], s))


def cm31_inv(x):
    """1/(x0 + x1 i) = (x0 - x1 i) / (x0^2 + x1^2)."""
    x0, x1 = x
    norm = m31.add(m31.mul(x0, x0), m31.mul(x1, x1))
    ninv = m31.inv(norm)
    return (m31.mul(x0, ninv), m31.neg(m31.mul(x1, ninv)))


def _cm31_mul_r(x):
    """Multiply by R = 2 + i:  (2+i)(x0+x1 i) = (2x0 - x1) + (x0 + 2x1) i."""
    x0, x1 = x
    return (
        m31.sub(m31.add(x0, x0), x1),
        m31.add(x0, m31.add(x1, x1)),
    )


# ---------------------------------------------------------------------------
# QM31 on 4-limb tuples
# ---------------------------------------------------------------------------


def qadd(x, y):
    return tuple(m31.add(a, b) for a, b in zip(x, y))


def qsub(x, y):
    return tuple(m31.sub(a, b) for a, b in zip(x, y))


def qneg(x):
    return tuple(m31.neg(a) for a in x)


def qmul(x, y):
    """(A + Bu)(C + Du) = (AC + R*BD) + (AD + BC) u, R = 2 + i."""
    a_ = (x[0], x[1])
    b_ = (x[2], x[3])
    c_ = (y[0], y[1])
    d_ = (y[2], y[3])
    ac = cm31_mul(a_, c_)
    bd = cm31_mul(b_, d_)
    ad = cm31_mul(a_, d_)
    bc = cm31_mul(b_, c_)
    first = cm31_add(ac, _cm31_mul_r(bd))
    second = cm31_add(ad, bc)
    return (first[0], first[1], second[0], second[1])


def qmul_m31(x, s):
    return tuple(m31.mul(a, s) for a in x)


def qinv(x):
    """(A + Bu)^-1 = (A - Bu) / (A^2 - R B^2)."""
    a_ = (x[0], x[1])
    b_ = (x[2], x[3])
    a2 = cm31_mul(a_, a_)
    b2 = cm31_mul(b_, b_)
    denom = cm31_sub(a2, _cm31_mul_r(b2))
    dinv = cm31_inv(denom)
    num_a = cm31_mul(a_, dinv)
    num_b = cm31_neg(cm31_mul(b_, dinv))
    return (num_a[0], num_a[1], num_b[0], num_b[1])


def qpow_scalar(x, e: int):
    result = qone_like(x)
    base = x
    while e > 0:
        if e & 1:
            result = qmul(result, base)
        base = qmul(base, base)
        e >>= 1
    return result


def qone_like(x):
    one = jnp.ones_like(x[0])
    zero = jnp.zeros_like(x[0])
    return (one, zero, zero, zero)


def qzero_like(x):
    zero = jnp.zeros_like(x[0])
    return (zero, zero, zero, zero)


def from_m31(a):
    """Embed base-field array into QM31 limbs."""
    zero = jnp.zeros_like(a)
    return (a, zero, zero, zero)


# ---------------------------------------------------------------------------
# Packed (..., 4) <-> limb-tuple conversion
# ---------------------------------------------------------------------------


def pack(x):
    return jnp.stack(x, axis=-1)


def unpack(arr):
    return tuple(arr[..., k] for k in range(4))


def pack_np(x):
    return np.stack([np.asarray(v, dtype=np.uint32) for v in x], axis=-1)


def unpack_np(arr):
    arr = np.asarray(arr, dtype=np.uint32)
    return tuple(arr[..., k] for k in range(4))


# ---------------------------------------------------------------------------
# Host (NumPy) reference versions — used by the VM/adapter and for tests
# ---------------------------------------------------------------------------


def _np_ops():
    return m31.add_np, m31.sub_np, m31.mul_np


def qadd_np(x, y):
    return tuple(m31.add_np(a, b) for a, b in zip(x, y))


def qsub_np(x, y):
    return tuple(m31.sub_np(a, b) for a, b in zip(x, y))


def qmul_np(x, y):
    add_, sub_, mul_ = _np_ops()

    def cmul(p, q):
        return (
            sub_(mul_(p[0], q[0]), mul_(p[1], q[1])),
            add_(mul_(p[0], q[1]), mul_(p[1], q[0])),
        )

    def cmul_r(p):
        return (sub_(add_(p[0], p[0]), p[1]), add_(p[0], add_(p[1], p[1])))

    a_, b_ = (x[0], x[1]), (x[2], x[3])
    c_, d_ = (y[0], y[1]), (y[2], y[3])
    ac, bd = cmul(a_, c_), cmul(b_, d_)
    ad, bc = cmul(a_, d_), cmul(b_, c_)
    first = (add_(ac[0], cmul_r(bd)[0]), add_(ac[1], cmul_r(bd)[1]))
    second = (add_(ad[0], bc[0]), add_(ad[1], bc[1]))
    return (first[0], first[1], second[0], second[1])


def qinv_np(x):
    add_, sub_, mul_ = _np_ops()

    def cmul(p, q):
        return (
            sub_(mul_(p[0], q[0]), mul_(p[1], q[1])),
            add_(mul_(p[0], q[1]), mul_(p[1], q[0])),
        )

    def cmul_r(p):
        return (sub_(add_(p[0], p[0]), p[1]), add_(p[0], add_(p[1], p[1])))

    a_, b_ = (x[0], x[1]), (x[2], x[3])
    a2, b2 = cmul(a_, a_), cmul(b_, b_)
    rb2 = cmul_r(b2)
    denom = (sub_(a2[0], rb2[0]), sub_(a2[1], rb2[1]))
    norm = add_(mul_(denom[0], denom[0]), mul_(denom[1], denom[1]))
    ninv = m31.inv_np(norm)
    dinv = (mul_(denom[0], ninv), m31.neg_np(mul_(denom[1], ninv)))
    na = cmul(a_, dinv)
    nb = cmul(b_, dinv)
    return (na[0], na[1], m31.neg_np(nb[0]), m31.neg_np(nb[1]))
