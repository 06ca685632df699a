"""AIR constraint framework: components, LogUp, composition polynomial.

Equivalent of `stwo_constraint_framework` (FrameworkEval / EvalAtRow /
LogupAtRow / relation combination — SURVEY.md §2.9) re-designed for JAX:
a component's ``evaluate(ev)`` is *plain Python over wrapped values* that
runs unchanged in three modes:

- **composition** (device): values are M31/QM31 jnp arrays over the 2x
  extended domain in row order; trace offsets are `jnp.roll` by
  ``blowup * offset`` (exact group translation — see test_fft.py);
- **OODS** (host): values are QM31 scalars sampled at the out-of-domain
  point z (offset -1 -> sample at z - g);
- **trace check** (host arrays): raw trace rows, `np.roll` by offset, for
  the assert_constraints debug tool (reference debug_tools, SURVEY.md §2.7).

LogUp (cumulative-sum lookup argument): relation entries are paired; each
pair gets one QM31 interaction column.  Columns 0..m-2 hold *within-row*
prefix sums; the last column accumulates over rows, shifted by
``claimed_sum / 2^log_size`` so the telescoping closes cyclically:

  k < m-1:  (c_k - c_{k-1}) * d0 * d1 - (m0*d1 + m1*d0) = 0
  last:     (c_m - c_{m-1} - c_m[-1] + S/2^n) * d0*d1 - (m0*d1 + m1*d0) = 0

where d = relation combine(values) = sum_j alpha^j v_j - z per entry.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ...field import m31
from ...field.qm31 import qadd, qinv, qmul, qmul_m31, qneg, qsub
from .fri import (
    QONE,
    QZERO,
    qscalar_add,
    qscalar_mul,
    qscalar_mul_m31,
    qscalar_sub,
)

P = (1 << 31) - 1


# ---------------------------------------------------------------------------
# Mode backends: uniform ops over base (M31) and extension (QM31) values
# ---------------------------------------------------------------------------


class DeviceOps:
    """Values: base = jnp uint32 array; ext = 4-tuple of arrays."""

    is_host = False
    xp = jnp

    badd = staticmethod(m31.add)
    bsub = staticmethod(m31.sub)
    bmul = staticmethod(m31.mul)
    bneg = staticmethod(m31.neg)
    eadd = staticmethod(qadd)
    esub = staticmethod(qsub)
    emul = staticmethod(qmul)
    eneg = staticmethod(qneg)
    emul_b = staticmethod(qmul_m31)

    @staticmethod
    def bconst(c, like):
        return jnp.full_like(like, c % P)

    @staticmethod
    def embed(b):
        z = jnp.zeros_like(b)
        return (b, z, z, z)

    @staticmethod
    def econst(q):
        return tuple(
            x if hasattr(x, "dtype") else jnp.uint32(int(x)) for x in q
        )


class HostOps:
    """Values: base = python int; ext = 4-tuple of ints."""

    is_host = True

    @staticmethod
    def badd(a, b):
        return (a + b) % P

    @staticmethod
    def bsub(a, b):
        return (a - b) % P

    @staticmethod
    def bmul(a, b):
        return (a * b) % P

    @staticmethod
    def bneg(a):
        return (-a) % P

    eadd = staticmethod(qscalar_add)
    esub = staticmethod(qscalar_sub)
    emul = staticmethod(qscalar_mul)

    @staticmethod
    def eneg(a):
        return tuple((-x) % P for x in a)

    @staticmethod
    def emul_b(a, s):
        return qscalar_mul_m31(a, s)

    @staticmethod
    def bconst(c, like):
        return c % P

    @staticmethod
    def embed(b):
        return (b, 0, 0, 0)

    @staticmethod
    def econst(q):
        return tuple(int(x) for x in q)


class HostArrayOps(DeviceOps):
    """NumPy-array mode for the trace-check tool."""

    is_host = False
    xp = np
    badd = staticmethod(m31.add_np)
    bsub = staticmethod(m31.sub_np)
    bmul = staticmethod(m31.mul_np)
    bneg = staticmethod(m31.neg_np)

    @staticmethod
    def _np_q(f):
        return f

    @staticmethod
    def eadd(a, b):
        return tuple(m31.add_np(x, y) for x, y in zip(a, b))

    @staticmethod
    def esub(a, b):
        return tuple(m31.sub_np(x, y) for x, y in zip(a, b))

    @staticmethod
    def emul(a, b):
        from ...field.qm31 import qmul_np

        return qmul_np(a, b)

    @staticmethod
    def eneg(a):
        return tuple(m31.neg_np(x) for x in a)

    @staticmethod
    def emul_b(a, s):
        return tuple(m31.mul_np(x, s) for x in a)

    @staticmethod
    def bconst(c, like):
        return np.full_like(like, c % P)

    @staticmethod
    def embed(b):
        z = np.zeros_like(b)
        return (b, z, z, z)

    @staticmethod
    def econst(q):
        return tuple(np.uint32(int(x)) for x in q)


class Val:
    """Field value wrapper: base (M31) or extension (QM31), mode-agnostic."""

    __slots__ = ("v", "ext", "ops")

    def __init__(self, v, ext: bool, ops):
        self.v = v
        self.ext = ext
        self.ops = ops

    # -- coercion --

    def _lift(self, other):
        if isinstance(other, Val):
            return other
        if isinstance(other, int):
            return Val(self.ops.bconst(other, self._like()), False, self.ops)
        raise TypeError(type(other))

    def _like(self):
        return self.v if not self.ext else self.v[0]

    def as_ext(self):
        if self.ext:
            return self
        return Val(self.ops.embed(self.v), True, self.ops)

    # -- arithmetic --

    def __add__(self, other):
        o = self._lift(other)
        ops = self.ops
        if self.ext or o.ext:
            return Val(ops.eadd(self.as_ext().v, o.as_ext().v), True, ops)
        return Val(ops.badd(self.v, o.v), False, ops)

    __radd__ = __add__

    def __sub__(self, other):
        o = self._lift(other)
        ops = self.ops
        if self.ext or o.ext:
            return Val(ops.esub(self.as_ext().v, o.as_ext().v), True, ops)
        return Val(ops.bsub(self.v, o.v), False, ops)

    def __rsub__(self, other):
        return self._lift(other).__sub__(self)

    def __mul__(self, other):
        o = self._lift(other)
        ops = self.ops
        if self.ext and o.ext:
            return Val(ops.emul(self.v, o.v), True, ops)
        if self.ext:
            return Val(ops.emul_b(self.v, o.v), True, ops)
        if o.ext:
            return Val(ops.emul_b(o.v, self.v), True, ops)
        return Val(ops.bmul(self.v, o.v), False, ops)

    __rmul__ = __mul__

    def __neg__(self):
        if self.ext:
            return Val(self.ops.eneg(self.v), True, self.ops)
        return Val(self.ops.bneg(self.v), False, self.ops)


# ---------------------------------------------------------------------------
# Relations (LogUp lookup tables)
# ---------------------------------------------------------------------------


@dataclass
class Relation:
    """A named LogUp relation of fixed arity; draws (z, alpha) per proof."""

    name: str
    arity: int
    z: tuple = QZERO
    alpha_powers: list = field(default_factory=list)

    def draw(self, channel):
        self.z = channel.draw_felt()
        alpha = channel.draw_felt()
        pw = [QONE]
        for _ in range(self.arity - 1):
            pw.append(qscalar_mul(pw[-1], alpha))
        self.alpha_powers = pw

    def combine(self, values):
        """sum_j alpha^j v_j - z on wrapped Vals -> ext Val."""
        ops = values[0].ops
        acc = None
        for j, v in enumerate(values):
            term = v * Val(ops.econst(self.alpha_powers[j]), True, ops)
            acc = term if acc is None else acc + term
        return acc - Val(ops.econst(self.z), True, ops)


@dataclass
class RelationEntry:
    relation: Relation
    multiplicity: Val  # signed numerator (e.g. +enabler / -enabler / -mult)
    values: list  # of Val


# ---------------------------------------------------------------------------
# EvalAtRow
# ---------------------------------------------------------------------------


class EvalAtRow:
    """Constraint-collection context handed to Component.evaluate().

    ``trace(idx, offset)`` / ``interaction(idx, offset)`` return wrapped
    values; the framework provides mode-specific implementations.
    """

    def __init__(self, ops, trace_getter, interaction_getter, logup_cumsum_shift,
                 preprocessed_getter=None):
        self.ops = ops
        self._trace = trace_getter
        self._interaction = interaction_getter
        self._preprocessed = preprocessed_getter
        self._trace_idx = 0
        self._preprocessed_idx = 0
        self.constraints = []  # list of Val (ext or base)
        self.relation_entries = []  # list of RelationEntry
        self._logup_shift = logup_cumsum_shift  # ext Val: claimed_sum / 2^n
        self._like = None
        self.collect_only = False  # skip logup constraint emission (witness passes)

    # -- masks --

    def next_trace_mask(self) -> Val:
        v = self._trace(self._trace_idx, 0)
        self._trace_idx += 1
        self._like = v
        return v

    def const(self, c: int) -> Val:
        return Val(self.ops.bconst(c, self._like._like()), False, self.ops)

    def next_trace_masks(self, n: int):
        return [self.next_trace_mask() for _ in range(n)]

    def next_preprocessed_mask(self) -> Val:
        v = self._preprocessed(self._preprocessed_idx, 0)
        self._preprocessed_idx += 1
        return v

    # -- constraints / lookups --

    def add_constraint(self, v: Val):
        self.constraints.append(v)

    def add_to_relation(self, relation: Relation, multiplicity: Val, values):
        self.relation_entries.append(RelationEntry(relation, multiplicity, list(values)))

    def finalize_logup_in_pairs(self):
        """Emit the LogUp constraints over the interaction columns."""
        entries = self.relation_entries
        if not entries or self.collect_only:
            return
        prev_col = None  # Val ext: previous pair column at offset 0
        n_pairs = (len(entries) + 1) // 2
        for k in range(n_pairs):
            pair = entries[2 * k : 2 * k + 2]
            cur = self._interaction(k, 0)
            is_last = k == n_pairs - 1
            if len(pair) == 2:
                e0, e1 = pair
                d0 = e0.relation.combine(e0.values)
                d1 = e1.relation.combine(e1.values)
                numer = e0.multiplicity * d1 + e1.multiplicity * d0
                denom = d0 * d1
            else:
                (e0,) = pair
                d0 = e0.relation.combine(e0.values)
                numer = e0.multiplicity.as_ext()
                denom = d0
            delta = cur if prev_col is None else cur - prev_col
            if is_last:
                prev_row = self._interaction(k, -1)
                delta = delta - prev_row + self._logup_shift
            self.add_constraint(delta * denom - numer)
            prev_col = cur


# ---------------------------------------------------------------------------
# Component base
# ---------------------------------------------------------------------------


class Component:
    """One AIR component.  Subclasses define:

    - ``name``
    - ``n_trace_cols`` (and ``n_preprocessed_cols`` if any)
    - ``evaluate(self, ev)``: constraints + relation entries
    and carry ``log_size`` plus witness data after trace generation.
    """

    name = "component"
    log_size: int = 0
    n_trace_cols: int = 0
    n_preprocessed_cols: int = 0
    #: True when every committed trace column is identically zero (all rows
    #: padding, or an all-zero multiplicity table) AND the claimed sum is 0.
    #: Every constraint in every component is either enabler-guarded or a
    #: product of trace columns (checked by tests/test_constraints.py::
    #: test_zero_witness_fast_paths), so such a component's interaction
    #: columns and composition contribution are identically zero — the
    #: prover skips their device work entirely (VERDICT r4 item #2).
    zero_witness: bool = False

    def n_lookups(self) -> int:
        raise NotImplementedError

    def n_interaction_cols(self) -> int:
        return (self.n_lookups() + 1) // 2

    def max_constraint_log_degree_bound(self) -> int:
        return self.log_size + 1

    def evaluate(self, ev: EvalAtRow):
        raise NotImplementedError

    def mix_into(self, channel):
        channel.mix_u64(self.log_size)


def logup_shift_scalar(claimed_sum, log_size: int):
    """claimed_sum / 2^log_size as a host QM31 tuple."""
    inv2n = pow(1 << log_size, P - 2, P)
    return qscalar_mul_m31(claimed_sum, inv2n)


_LOOKUP_COUNT_CACHE: dict = {}


def count_lookups(comp) -> int:
    """Number of relation entries comp.evaluate() emits, by dry-running it.

    The single source of truth for interaction-column counts — a
    hand-maintained formula drifts the moment a component adds a
    range-check or bitwise lookup in its extra constraints."""
    from ...prover.config import SCALE

    key = (type(comp).__name__, comp.name, SCALE.key())
    if key in _LOOKUP_COUNT_CACHE:
        return _LOOKUP_COUNT_CACHE[key]
    rel = comp.relations
    saved = {id(r): (r.z, r.alpha_powers) for r in rel.all()}
    for r in rel.all():
        r.z = (0, 0, 0, 0)
        r.alpha_powers = [(1, 0, 0, 0)] * r.arity
    try:
        z1 = np.zeros(1, np.uint32)
        ev = EvalAtRow(
            HostArrayOps,
            lambda i, o: Val(z1, False, HostArrayOps),
            lambda i, o: Val((z1, z1, z1, z1), True, HostArrayOps),
            Val((z1, z1, z1, z1), True, HostArrayOps),
            lambda i, o: Val(z1, False, HostArrayOps),
        )
        comp.evaluate(ev)
        n = len(ev.relation_entries)
    finally:
        for r in rel.all():
            r.z, r.alpha_powers = saved[id(r)]
    _LOOKUP_COUNT_CACHE[key] = n
    return n
