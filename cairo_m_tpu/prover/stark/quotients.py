"""DEEP quotients: reduce "column f equals v at OODS point z" to low-degree.

Standard circle-STARK pair-vanishing construction (role of stwo's
`core::pcs::quotients`):  with ``conj`` the QM31/CM31 conjugation
``(A + Bu) -> (A - Bu)`` (an automorphism fixing M31, so real columns
satisfy ``f(conj z) = conj f(z)``), each (column, point z, value v) yields

    a = conj(v) - v
    c = conj(z).y - z.y           (shared by all columns sampled at z)
    b = v*c - a*z.y
    numerator_i(p)  = c*f_i(p) - (a_i*y_p + b_i)
    denominator_z(p) = (x_p - z.x)*(conj(z).y - z.y) - (y_p - z.y)*(conj(z).x - z.x)

(a line through z and conj z).  The quotient column for log_size l is

    Q_l(p) = sum_z  [ sum_i alpha^{k_i} * numerator_i(p) ] / denominator_z(p)

with one global alpha and k_i enumerating (tree, column, point) in
commitment order.  Q_l is low-degree iff every sampled value is correct.

Device path evaluates Q_l over full commit domains (batched, weights folded
into one QM31xM31 contraction per point); host path recomputes Q_l at query
positions for the FRI verifier.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...field import m31
from ...field.qm31 import from_m31, qadd, qinv, qmul, qmul_m31, qneg, qsub
from .fri import QONE, QZERO, qscalar_add, qscalar_mul, qscalar_mul_m31, qscalar_sub
from . import domain

P = (1 << 31) - 1


def qconj(v):
    """QM31/CM31 conjugation: (a, b, c, d) -> (a, b, -c, -d)."""
    return (v[0], v[1], (P - v[2]) % P, (P - v[3]) % P)


def line_coeffs(z, v):
    """(a, b, c) for one (point, value) sample (host scalars)."""
    zx, zy = z
    a = qscalar_sub(qconj(v), v)
    c = qscalar_sub(qconj(zy), zy)
    b = qscalar_sub(qscalar_mul(v, c), qscalar_mul(a, zy))
    return a, b, c


def denominator_coeffs(z):
    """(dx, dy, dc): d(p) = dx*x_p + dy*y_p + dc (host scalars)."""
    zx, zy = z
    dx = qscalar_sub(qconj(zy), zy)
    dy = qscalar_sub(zx, qconj(zx))
    dc = qscalar_sub(
        qscalar_mul(qconj(zx), zy), qscalar_mul(zx, qconj(zy))
    )
    # d(p) = (x - zx)*(conj(zy) - zy) - (y - zy)*(conj(zx) - zx)
    #      = dx*x + dy*y + (zy*conj(zx) - zx*conj(zy))
    return dx, dy, dc


def denominator_at(z, px: int, py: int):
    """d(p) for a base-field point (host scalar)."""
    dx, dy, dc = denominator_coeffs(z)
    return qscalar_add(
        qscalar_add(qscalar_mul_m31(dx, px), qscalar_mul_m31(dy, py)), dc
    )


class ColumnSampleBatch:
    """All samples at one point z for columns of one log_size:
    (z, [(column_ref, value, alpha_pow)])."""

    def __init__(self, z):
        self.z = z
        self.entries = []  # (column array or opened dict, value, alpha_pow)


def group_samples(samples):
    """samples: iterable of (log_size, column_handle, z, value, alpha_pow)
    -> {log_size: [ColumnSampleBatch]} preserving point order."""
    out: dict[int, list] = {}
    for log_size, col, z, v, apow in samples:
        batches = out.setdefault(log_size, [])
        for b in batches:
            if b.z == z:
                b.entries.append((col, v, apow))
                break
        else:
            b = ColumnSampleBatch(z)
            b.entries.append((col, v, apow))
            batches.append(b)
    return out


def quotient_column_device(log_size: int, batches):
    """Evaluate Q_l over the full commit domain (device).

    ``batches``: list of ColumnSampleBatch whose column handles are device
    M31 arrays in commit order.  Returns a QM31 limb tuple (commit order).
    """
    xs, ys = domain.coset_points(log_size)
    px = jnp.asarray(domain.to_commit_order(xs, log_size))
    py = jnp.asarray(domain.to_commit_order(ys, log_size))
    total = None
    for b in batches:
        # accumulate c * sum_i w_i f_i(p) - (y_p * sum w_i a_i + sum w_i b_i)
        wf = None  # QM31 accumulator of weighted columns
        wa = QZERO
        wb = QZERO
        _, _, c = line_coeffs(b.z, b.entries[0][1])
        for col, v, apow in b.entries:
            a_i, b_i, _ = line_coeffs(b.z, v)
            wa = qscalar_add(wa, qscalar_mul(apow, a_i))
            wb = qscalar_add(wb, qscalar_mul(apow, b_i))
            wcol = qmul_m31(tuple(jnp.uint32(int(x)) for x in apow), col)
            wf = wcol if wf is None else qadd(wf, wcol)
        cdev = tuple(jnp.uint32(int(x)) for x in c)
        wadev = tuple(jnp.uint32(int(x)) for x in wa)
        wbdev = tuple(jnp.uint32(int(x)) for x in wb)
        numer = qsub(
            qmul(wf, cdev),
            qadd(qmul_m31(wadev, py), wbdev),
        )
        dx, dy, dc = denominator_coeffs(b.z)
        den = qadd(
            qadd(
                qmul_m31(tuple(jnp.uint32(int(x)) for x in dx), px),
                qmul_m31(tuple(jnp.uint32(int(x)) for x in dy), py),
            ),
            tuple(jnp.uint32(int(x)) for x in dc),
        )
        term = qmul(numer, qinv(den))
        total = term if total is None else qadd(total, term)
    return total


def quotient_value_host(log_size: int, batches, pos: int):
    """Recompute Q_l at one commit-order position from opened values (host).

    Column handles in ``batches`` are dicts {position: int value}."""
    px, py = domain.commit_pos_point(pos, log_size)
    total = QZERO
    for b in batches:
        wa, wb, wfv = QZERO, QZERO, QZERO
        _, _, c = line_coeffs(b.z, b.entries[0][1])
        for col, v, apow in b.entries:
            a_i, b_i, _ = line_coeffs(b.z, v)
            wa = qscalar_add(wa, qscalar_mul(apow, a_i))
            wb = qscalar_add(wb, qscalar_mul(apow, b_i))
            wfv = qscalar_add(wfv, qscalar_mul_m31(apow, col[pos]))
        numer = qscalar_sub(
            qscalar_mul(wfv, c),
            qscalar_add(qscalar_mul_m31(wa, py), wb),
        )
        den = denominator_at(b.z, px, py)
        from .fri import qscalar_mul as qm

        total = qscalar_add(total, qm(numer, _qscalar_inv(den)))
    return total


def _qscalar_inv(v):
    from ...field.qm31 import qinv_np

    r = qinv_np(tuple(np.array([x], np.uint32) for x in v))
    return tuple(int(x[0]) for x in r)
