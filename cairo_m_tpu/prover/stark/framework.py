"""Runs components through the three evaluation modes.

- `gen_interaction_trace`: LogUp interaction columns + claimed sum (host,
  vectorized NumPy over trace rows).
- `compute_composition`: the random-linear-combination quotient polynomial
  over the extended domain (device).
- `evaluate_at_point`: the same combination at the OODS point from sampled
  mask values (host scalars) — the verifier's composition check.
- `assert_constraints`: raw-trace constraint evaluation pinpointing failing
  (component, constraint, row) — the `debug_tools/assert_constraints.rs`
  equivalent (SURVEY.md §2.7).

Composition convention (prover & verifier): with global random coeff
``alpha`` and components in commitment order,

  composition = sum_c alpha^{after_c} * V_c^{-1} * sum_k alpha^{n_c-1-k} C_{c,k}

where ``after_c`` = number of constraints of all later components and V_c
the vanishing polynomial of c's trace domain.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...field import m31
from ...field.qm31 import qinv_np, qmul_np
from . import domain, fft
from .air import (
    Component,
    DeviceOps,
    EvalAtRow,
    HostArrayOps,
    HostOps,
    Val,
    logup_shift_scalar,
)
from .fri import QONE, QZERO, qscalar_add, qscalar_mul, qscalar_mul_m31

P = (1 << 31) - 1


# ---------------------------------------------------------------------------
# Interaction trace generation (host, vectorized)
# ---------------------------------------------------------------------------


def _entries_host(component, trace_rows, preprocessed_rows=()):
    """Run evaluate() in NumPy-array mode to collect relation entries."""
    n = 1 << component.log_size

    def trace_getter(idx, offset):
        col = trace_rows[idx]
        # offset -1 = previous row = roll forward by +1
        return Val(np.roll(col, -offset) if offset else col, False, HostArrayOps)

    def pp_getter(idx, offset):
        return Val(preprocessed_rows[idx], False, HostArrayOps)

    def interaction_getter(idx, offset):
        z = np.zeros(n, dtype=np.uint32)
        return Val((z, z, z, z), True, HostArrayOps)

    shift = Val(
        tuple(np.zeros(n, dtype=np.uint32) for _ in range(4)), True, HostArrayOps
    )
    ev = EvalAtRow(HostArrayOps, trace_getter, interaction_getter, shift, pp_getter)
    ev.collect_only = True
    component.evaluate(ev)
    return ev.relation_entries


def gen_interaction_trace(component: Component, trace_rows, preprocessed_rows=()):
    """-> (interaction QM31 columns [n_pairs][4] np arrays row order,
           claimed_sum QM31 tuple)."""
    entries = _entries_host(component, trace_rows, preprocessed_rows)
    n = 1 << component.log_size
    # numerators (QM31 arrays) and denominators per entry
    numers, denoms = [], []
    for e in entries:
        mv = e.multiplicity.as_ext().v
        numers.append(tuple(np.broadcast_to(np.asarray(x), (n,)).copy() for x in mv))
        d = e.relation.combine(e.values).v
        denoms.append(tuple(np.broadcast_to(np.asarray(x), (n,)).copy() for x in d))
    inv_denoms = [qinv_np(d) for d in denoms]
    # per-pair fractions
    n_pairs = (len(entries) + 1) // 2
    fracs = []
    for k in range(n_pairs):
        if 2 * k + 1 < len(entries):
            t0 = qmul_np(numers[2 * k], inv_denoms[2 * k])
            t1 = qmul_np(numers[2 * k + 1], inv_denoms[2 * k + 1])
            fracs.append(tuple(m31.add_np(a, b) for a, b in zip(t0, t1)))
        else:
            fracs.append(qmul_np(numers[2 * k], inv_denoms[2 * k]))
    # claimed sum = total of all fractions over all rows
    total = QZERO
    for f in fracs:
        total = qscalar_add(total, tuple(int(np.sum(x.astype(np.uint64)) % P) for x in f))
    # columns: within-row prefix sums; last column cumulative over rows
    cols = []
    running = None
    for k in range(n_pairs - 1):
        running = fracs[k] if running is None else tuple(
            m31.add_np(a, b) for a, b in zip(running, fracs[k])
        )
        cols.append(running)
    row_total = fracs[-1] if running is None else tuple(
        m31.add_np(a, b) for a, b in zip(running, fracs[-1])
    )
    shift = logup_shift_scalar(total, component.log_size)
    shifted = tuple(
        m31.sub_np(x, np.uint32(s)) for x, s in zip(row_total, shift)
    )
    last_col = tuple(_cumsum_mod(x) for x in shifted)
    cols.append(last_col)
    return cols, total


def _cumsum_mod(x: np.ndarray) -> np.ndarray:
    # values < 2^31, n <= 2^24 -> sum < 2^55 fits in uint64
    return (np.cumsum(x, dtype=np.uint64) % P).astype(np.uint32)


# ---------------------------------------------------------------------------
# Interaction trace generation (device, wide-tape-compiled)
# ---------------------------------------------------------------------------
# The host path above is kept as the golden reference / debug tool; the
# prover uses this device path: entry numerators/denominators evaluate via
# the wide tape interpreter (stark/wtape.py) on the base domain, then
# batched QM31 inversion, pair fractions, within-row prefix columns and the
# shifted row-cumulative last column run as two jitted kernels.  Tapes are
# recorded once per (component, log_size): per-proof relation parameters
# enter as *dynamic constants*.

import os as _os

from .wtape import WideOps, WideRecorder, run_wide, schedule_wide

_WIDE_W = int(_os.environ.get("CM_TAPE_WIDTH", "32"))

_PLAN_CACHE: dict = {}


def _record_with_dyn_relations(relations, build):
    """Record with every relation's (z, alpha_powers) replaced by dynamic
    const slots, so the resulting plan is proof-independent."""
    rec = WideRecorder()
    ops = WideOps(rec)
    saved = [(r, r.z, r.alpha_powers) for r in relations.all()]
    for r in relations.all():
        r.z = tuple(rec.dyn_const(("relz", r.name, k)) for k in range(4))
        r.alpha_powers = [
            tuple(rec.dyn_const(("rela", r.name, j, k)) for k in range(4))
            for j in range(r.arity)
        ]
    try:
        outputs = build(rec, ops)
    finally:
        for r, z, ap in saved:
            r.z, r.alpha_powers = z, ap
    return schedule_wide(rec, outputs, width=_WIDE_W)


class _DynResolver:
    """dict-like: resolves dynamic-const keys to per-proof values."""

    def __init__(self, relations, shift=None, apows=None):
        self.rel = {r.name: r for r in relations.all()}
        self.shift = shift
        self.apows = apows  # list of QM31 tuples, index = exponent

    def __getitem__(self, key):
        tag = key[0]
        if tag == "relz":
            return self.rel[key[1]].z[key[2]]
        if tag == "rela":
            return self.rel[key[1]].alpha_powers[key[2]][key[3]]
        if tag == "shift":
            return self.shift[key[1]]
        if tag == "apow":
            return self.apows[key[1]][key[2]]
        raise KeyError(key)


def interaction_plan(comp, relations):
    """Cached wide plan computing, per relation entry: numerator limbs 0-3
    then denominator limbs 0-3 (8 outputs per entry)."""
    from ...prover.config import SCALE

    key = ("interaction", comp.name, comp.log_size, SCALE.key(),
           getattr(comp, "plan_key_extra", ""))
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit

    def build(rec, ops):
        def tg(idx, offset):
            return Val(rec.bank_src("t", idx, offset), False, ops)

        def pg(idx, offset):
            return Val(rec.bank_src("p", idx, offset), False, ops)

        def ig(idx, offset):  # pragma: no cover - collect_only skips finalize
            raise AssertionError("interaction columns unavailable while recording")

        shift = Val(ops.econst((0, 0, 0, 0)), True, ops)
        ev = EvalAtRow(ops, tg, ig, shift, pg)
        ev.collect_only = True
        comp.evaluate(ev)
        outs = []
        for e in ev.relation_entries:
            outs += list(e.multiplicity.as_ext().v)
            outs += list(e.relation.combine(e.values).v)
        n_e = len(ev.relation_entries)
        # pad the entry count to a power of two with 0/1 fractions so the
        # logup kernels bucket by shape (the extra zero fractions change no
        # committed column: prefix sums are sliced to the true pair count)
        from .wtape import _bucket

        for _ in range(_bucket(n_e, 2) - n_e):
            outs += [ops.bconst(0)] * 4 + [ops.bconst(1)] + [ops.bconst(0)] * 3
        return outs, n_e

    n_entries_box = []

    def build2(rec, ops):
        outs, n_e = build(rec, ops)
        n_entries_box.append(n_e)
        return outs

    plan = _record_with_dyn_relations(relations, build2)
    result = (plan, n_entries_box[0])
    _PLAN_CACHE[key] = result
    return result


from functools import lru_cache as _lru_cache

from ...field.qm31 import qinv as _qinv_dev, qmul as _qmul_dev


@_lru_cache(maxsize=None)
def _logup_prefix_kernel(E: int, log_size: int):
    """(8E, n) entry numer/denom rows -> (ceil(E/2), 4, n) within-row
    prefix sums of the pair fractions."""
    import jax

    n = 1 << log_size

    def f(outs):
        x = outs.reshape(E, 2, 4, n)
        numer = tuple(x[:, 0, k, :] for k in range(4))
        denom = tuple(x[:, 1, k, :] for k in range(4))
        fr = _qmul_dev(numer, _qinv_dev(denom))
        fr = jnp.stack(fr, axis=1)  # (E, 4, n)
        if E % 2:
            fr = jnp.concatenate(
                [fr, jnp.zeros((1, 4, n), jnp.uint32)], axis=0
            )
        pairs = m31.add(fr[0::2], fr[1::2])
        return jax.lax.associative_scan(m31.add, pairs, axis=0)

    return jax.jit(f)


@_lru_cache(maxsize=None)
def _logup_last_kernel(log_size: int):
    """(4, n) row totals -> (shifted cumulative last column (4, n),
    claimed sum (4,))."""
    import jax as _jax

    inv2n = pow(1 << log_size, P - 2, P)

    def f(row_total):
        total = jnp.stack(
            [m31.sum_mod(row_total[k], axis=0) for k in range(4)]
        )
        shift = m31.mul(total, jnp.uint32(inv2n))
        shifted = m31.sub(row_total, shift[:, None])
        last = _jax.lax.associative_scan(m31.add, shifted, axis=1)
        return last, total

    return jax.jit(f)


def gen_interaction_trace_device(comp, trace_stack, pre_stack):
    """Device path of gen_interaction_trace.

    ``trace_stack``/``pre_stack``: (k, 2^log_size) device uint32 stacks of
    the component's trace / preprocessed rows (row order).
    -> (stacked interaction limb columns (4*n_pairs, n) device,
        claimed_sum (4,) device array — NOT pulled to host here, so callers
        can batch all components' sums into one transfer).
    """
    l = comp.log_size
    n = 1 << l
    plan, E = interaction_plan(comp, comp.relations)
    Epad = len(plan.out_regs) // 8
    kt = int(trace_stack.shape[0])
    src = np.zeros(len(plan.used_bank), np.int32)
    sh = np.zeros(len(plan.used_bank), np.uint32)
    for j, (kind, idx, off) in enumerate(plan.used_bank):
        src[j] = idx if kind == "t" else kt + idx
        sh[j] = off % n
    consts = plan.const_values(_DynResolver(comp.relations))
    outs = run_wide(
        (trace_stack, pre_stack), src, sh, consts, plan, l, fft_order=False
    )
    prefix = _logup_prefix_kernel(Epad, l)(outs)
    n_pairs = (E + 1) // 2
    row_total = prefix[n_pairs - 1]
    last, total = _logup_last_kernel(l)(row_total)
    # stacked interaction limb columns: pair0 limb0-3, pair1 limb0-3, ...
    # (kept stacked — per-column slicing costs one eager compile per index)
    stacked = jnp.concatenate(
        [prefix[: n_pairs - 1].reshape((n_pairs - 1) * 4, n), last], axis=0
    )
    return stacked, total


# ---------------------------------------------------------------------------
# Device-side table multiplicity counting
# ---------------------------------------------------------------------------
# The rayon-atomics role of the reference's range-check/bitwise counting
# (`preprocessed/range_check/range_check_macro.rs:72-84`) mapped to TPU as
# one-hot scatter-adds (SURVEY.md §2.10): every component's table-relation
# entries are extracted by a wide-tape plan from its already-uploaded trace
# stack and histogrammed into device accumulators, replacing the host
# re-derivation + np.add.at pass that serialized the trace phase.

_TCOUNT_TABLES = ("RangeCheck8", "RangeCheck16", "RangeCheck20", "Bitwise")


def table_count_plan(comp, relations):
    """Cached wide plan extracting, per table-relation entry of ``comp``:
    the multiplicity (limb 0), then the index values (1 for range checks,
    op/in1/in2 for bitwise).  -> (plan, meta) with meta the table name per
    entry in output order (empty if the component consumes no table)."""
    from ...prover.config import SCALE

    key = ("tcount", comp.name, comp.log_size, SCALE.key(),
           getattr(comp, "plan_key_extra", ""))
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit

    meta_box = []

    def build(rec, ops):
        def tg(idx, offset):
            return Val(rec.bank_src("t", idx, offset), False, ops)

        def pg(idx, offset):
            return Val(rec.bank_src("p", idx, offset), False, ops)

        def ig(idx, offset):  # pragma: no cover - collect_only skips finalize
            raise AssertionError("interaction columns unavailable while recording")

        shift = Val(ops.econst((0, 0, 0, 0)), True, ops)
        ev = EvalAtRow(ops, tg, ig, shift, pg)
        ev.collect_only = True
        comp.evaluate(ev)
        outs, meta = [], []
        for e in ev.relation_entries:
            nm = e.relation.name
            if nm not in _TCOUNT_TABLES:
                continue
            outs.append(e.multiplicity.as_ext().v[0])
            n_vals = 3 if nm == "Bitwise" else 1
            for v in e.values[:n_vals]:
                outs.append(v.v if not v.ext else v.v[0])
            meta.append(nm)
        meta_box.append(tuple(meta))
        return outs

    if not _touches_tables(comp):
        result = (None, ())
    else:
        # plain recording — no relation z/alpha dyn consts: entries are
        # collected raw (no combine), so the plan has no per-proof
        # constants and can run before relations.draw
        rec = WideRecorder()
        ops = WideOps(rec)
        outs = build(rec, ops)
        plan = schedule_wide(rec, outs, width=_WIDE_W)
        result = (plan, meta_box[0])
    _PLAN_CACHE[key] = result
    return result


def _touches_tables(comp) -> bool:
    from ..components.registry import _touched_relations

    return bool(_touched_relations(comp) & set(_TCOUNT_TABLES))


@_lru_cache(maxsize=None)
def _tcount_kernel(meta, table_logs):
    """jit: (outs (n_out, n), accs in _TCOUNT_TABLES order) -> new accs.

    Weights are the consumptions ``-mult`` (padding rows have mult 0 and
    contribute 0); out-of-range index values (possible only on zero-weight
    padding rows) are dropped by the scatter."""
    import jax as _jax

    def f(outs, accs):
        new = list(accs)
        per = {nm: ([], []) for nm in _TCOUNT_TABLES}
        off = 0
        for nm in meta:
            w = m31.sub(jnp.zeros_like(outs[off]), outs[off])
            if nm == "Bitwise":
                idx = (
                    (outs[off + 1] << jnp.uint32(16))
                    + (outs[off + 2] << jnp.uint32(8))
                    + outs[off + 3]
                )
                off += 4
            else:
                idx = outs[off + 1]
                off += 2
            per[nm][0].append(idx)
            per[nm][1].append(w)
        for ti, nm in enumerate(_TCOUNT_TABLES):
            idxs, ws = per[nm]
            if not idxs:
                continue
            idx = jnp.concatenate(idxs).astype(jnp.int32)
            w = jnp.concatenate(ws)
            new[ti] = new[ti].at[idx].add(w, mode="drop")
        return tuple(new)

    return _jax.jit(f)


class TableCounter:
    """Device accumulators for the four preprocessed tables' multiplicity
    columns.  Raw uint32 adds (no mod): total consumptions per proof are
    bounded by the segment cap (2^20−1 steps) times entries per row, far
    below 2^31.  Single-device path — the GSPMD-sharded prover keeps the
    host histograms (scatter-add across shards would reshard the tables)."""

    def __init__(self, relations, rc_big_bits: int, bitwise_log: int):
        self.relations = relations
        self._logs = (8, 16, rc_big_bits, bitwise_log)
        self.acc = tuple(
            jnp.zeros(1 << b, jnp.uint32) for b in self._logs
        )
        self.touched = [False] * 4

    def add(self, comp, trace_stack):
        """Fold one non-zero-witness component's table consumptions in."""
        plan, meta = table_count_plan(comp, self.relations)
        if not meta:
            return
        for nm in set(meta):
            self.touched[_TCOUNT_TABLES.index(nm)] = True
        n = 1 << comp.log_size
        assert not comp.n_preprocessed_cols, comp.name
        pre_stack = jnp.zeros((0, n), jnp.uint32)
        src = np.zeros(len(plan.used_bank), np.int32)
        sh = np.zeros(len(plan.used_bank), np.uint32)
        kt = int(trace_stack.shape[0])
        for j, (kind, idx, off) in enumerate(plan.used_bank):
            src[j] = idx if kind == "t" else kt + idx
            sh[j] = off % n
        consts = plan.const_values(_DynResolver(self.relations))
        outs = run_wide(
            (trace_stack, pre_stack), src, sh, consts, plan,
            comp.log_size, fft_order=False,
        )
        self.acc = _tcount_kernel(meta, self._logs)(outs, self.acc)

    def finalize(self):
        """-> (mult column per table (device, (n,) uint32), touched flags)."""
        return self.acc, tuple(self.touched)


# ---------------------------------------------------------------------------
# Composition (device, wide-tape-compiled)
# ---------------------------------------------------------------------------
# XLA compile time is superlinear in graph size, so per-component symbolic
# graphs are unusable on TPU (see stark/wtape.py).  Each component's
# constraints are instead *recorded* once per (component, log_size) into a
# wide-scheduled instruction plan executed by one generic jitted
# interpreter whose compile cost is O(1) in the number of
# components/constraints.  The constraints are combined as the weighted sum
# sum_k alpha^{n-1-k} * C_k (== the verifier's Horner chain) with the alpha
# powers as dynamic constants and a *balanced add tree*, keeping the
# schedulable depth logarithmic instead of serial in #constraints.

import jax

_COUNT_CACHE: dict = {}


def count_constraints(comp) -> int:
    # comp.name (not just the class) — all opcode components share one class
    from ...prover.config import SCALE

    key = (type(comp).__name__, comp.name, comp.log_size, SCALE.key(),
           getattr(comp, "plan_key_extra", ""))
    if key in _COUNT_CACHE:
        return _COUNT_CACHE[key]
    rel = comp.relations
    saved = {r.name: (r.z, r.alpha_powers) for r in rel.all()}
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
        n = len(ev.constraints)
    finally:
        for r in rel.all():
            r.z, r.alpha_powers = saved[r.name]
    _COUNT_CACHE[key] = n
    return n


def composition_plan(comp, relations):
    """Cached wide plan: comp.evaluate() + weighted constraint combination
    + the vanishing division.  Bank kinds: 't' trace, 'i' interaction limb,
    'p' preprocessed, 'v' vanishing-inverse row.  Per-proof scalars (drawn
    relation parameters, logup shift, alpha powers) are dynamic consts."""
    from ...prover.config import SCALE

    key = ("composition", comp.name, comp.log_size, SCALE.key(),
           getattr(comp, "plan_key_extra", ""))
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit

    def build(rec, ops):
        def tg(idx, offset):
            return Val(rec.bank_src("t", idx, offset), False, ops)

        def ig(idx, offset):
            return Val(
                tuple(rec.bank_src("i", 4 * idx + k, offset) for k in range(4)),
                True,
                ops,
            )

        def pg(idx, offset):
            return Val(rec.bank_src("p", idx, offset), False, ops)

        shift = Val(
            tuple(rec.dyn_const(("shift", k)) for k in range(4)), True, ops
        )
        ev = EvalAtRow(ops, tg, ig, shift, pg)
        comp.evaluate(ev)
        ncon = len(ev.constraints)
        terms = []
        for k, c in enumerate(ev.constraints):
            w = tuple(rec.dyn_const(("apow", ncon - 1 - k, j)) for j in range(4))
            terms.append(ops.emul(c.as_ext().v, w))
        acc = ops.etree_sum(terms)
        vinv = rec.bank_src("v", 0, 0)
        return list(ops.emul_b(acc, vinv))

    plan = _record_with_dyn_relations(relations, build)
    _PLAN_CACHE[key] = plan
    return plan


@jax.jit
def _accumulate_coeffs(acc, new):
    return tuple(m31.add(a, b) for a, b in zip(acc, new))


from functools import lru_cache


@jax.jit
def _weight_contrib(contrib, w4):
    return _qmul_limbs(contrib, tuple(w4[k] for k in range(4)))


@jax.jit
def _accumulate_limbs(acc, new):
    return tuple(m31.add(a, b) for a, b in zip(acc, new))


@lru_cache(maxsize=None)
def _evals_to_coeffs(elog: int, max_elog: int):
    """Row-order 4-limb evaluations on the 2^elog domain -> coefficients
    embedded in the 2^max_elog basis (one call per elog per proof).
    Inverse twiddles ride as jit args — not baked constants (HBM)."""

    def f(evals, itw):
        # one (4, n) batched transform instead of four k=1 calls: fewer
        # dispatches and the batch axis stays padded-safe (fft._pad_lead)
        stacked = jnp.stack([domain.to_fft_order(x) for x in evals])
        co = fft.embed_coeffs(fft.ifft(stacked, elog, itw), elog, max_elog)
        return tuple(co[k] for k in range(4))

    jitted = jax.jit(f)
    return lambda evals: jitted(evals, fft.twiddles_dev(elog, True))


def _qmul_limbs(a, b):
    from ...field.qm31 import qmul

    return qmul(a, b)


def compute_composition(
    components, relations, pre_phase, trace_phase, inter_phase,
    pre_owner_map, claimed_sums, random_coeff, blowup=1,
):
    """-> (composition 4-limb tuple in fft order, log size max+blowup).

    The three phases are `pcs.CommitmentPhase` objects whose FFT-order
    extended column stacks (``stacked_ext``, computed once during commit)
    are reused directly — no per-component LDE.  ``pre_owner_map``:
    ``{id(comp): (global pre column start, count)}``.
    """
    counts = [count_constraints(c) for c in components]
    max_elog = max(c.log_size for c in components) + blowup
    # alpha powers 0..max(counts)-1 for the in-component weighted sums
    apows = [QONE]
    for _ in range(max(counts)):
        apows.append(qscalar_mul(apows[-1], random_coeff))
    total = None
    ti = ii = 0
    by_elog: dict = {}
    zero_stack_cache = {}
    for i, comp in enumerate(components):
        l = comp.log_size
        elog = l + blowup
        n = 1 << elog
        if comp.zero_witness:
            # every constraint is enabler-guarded or a product of (all-zero)
            # trace columns, and the interaction columns + claimed sum are 0
            # -> the component's composition contribution is identically 0.
            ti += comp.n_trace_cols
            ii += 4 * comp.n_interaction_cols()
            continue
        plan = composition_plan(comp, relations)
        consts = plan.const_values(
            _DynResolver(
                relations,
                shift=logup_shift_scalar(claimed_sums[i], l),
                apows=apows,
            )
        )
        text = trace_phase.stacked_ext[elog]
        iext = inter_phase.stacked_ext[elog]
        pext = pre_phase.stacked_ext.get(elog)
        if pext is None:
            pext = zero_stack_cache.get(elog)
            if pext is None:
                pext = jnp.zeros((0, n), jnp.uint32)
                zero_stack_cache[elog] = pext
        Kt, Ki, Kp = int(text.shape[0]), int(iext.shape[0]), int(pext.shape[0])
        pre_start = pre_owner_map.get(id(comp), (0, 0))[0]
        roll = 1 << blowup
        src = np.zeros(len(plan.used_bank), np.int32)
        sh = np.zeros(len(plan.used_bank), np.uint32)
        for j, (kind, idx, offset) in enumerate(plan.used_bank):
            if kind == "t":
                _, pos = trace_phase.group_index[ti + idx]
                src[j] = pos
            elif kind == "i":
                _, pos = inter_phase.group_index[ii + idx]
                src[j] = Kt + pos
            elif kind == "p":
                _, pos = pre_phase.group_index[pre_start + idx]
                src[j] = Kt + Ki + pos
            else:  # vanishing inverse row
                src[j] = Kt + Ki + Kp
            sh[j] = (roll * offset) % n
        _, vinv = domain.vanishing_on_domain(l, elog)
        vrow = jnp.asarray(domain.to_fft_order(vinv)[None])
        out = run_wide((text, iext, pext, vrow), src, sh, consts, plan, elog)
        contrib = tuple(out[k] for k in range(4))
        after = sum(counts[i + 1 :])
        w4 = jnp.asarray(np.array(_qpow_scalar(random_coeff, after), np.uint32))
        # accumulate weighted contributions per evaluation domain; the
        # ifft+embed runs ONCE per elog instead of once per component
        acc = by_elog.get(elog)
        weighted = _weight_contrib(contrib, w4)
        by_elog[elog] = (
            weighted if acc is None else _accumulate_limbs(acc, weighted)
        )
        ti += comp.n_trace_cols
        ii += 4 * comp.n_interaction_cols()
    for elog in sorted(by_elog, reverse=True):
        co = _evals_to_coeffs(elog, max_elog)(by_elog[elog])
        total = co if total is None else _accumulate_coeffs(total, co)
    tw = fft.twiddles_dev(max_elog, False)
    ev4 = _final_fft(max_elog)(jnp.stack(total), tw)
    comp_evals = tuple(ev4[k] for k in range(4))
    return comp_evals, max_elog


@lru_cache(maxsize=None)
def _final_fft(max_elog: int):
    return jax.jit(lambda c4, tw: fft.fft(c4, max_elog, tw))


def _qpow_scalar(a, e: int):
    from .fri import QONE

    r = QONE
    base = a
    while e > 0:
        if e & 1:
            r = qscalar_mul(r, base)
        base = qscalar_mul(base, base)
        e >>= 1
    return r


# ---------------------------------------------------------------------------
# OODS evaluation (host scalars) — verifier side
# ---------------------------------------------------------------------------


def evaluate_at_point(
    components,
    sampled_trace,
    sampled_interaction,
    claimed_sums,
    random_coeff,
    z_values,
    sampled_preprocessed=None,
):
    """Recompute the composition value at z from sampled mask values.

    sampled_trace: per component, per trace column, [value_at_z]
    sampled_interaction: per component, per limb column, [v(z_prev), v(z)]
    z_values: per component, V_l(z) (QM31) for its trace log size.
    Returns QM31 scalar.
    """
    counts = []
    contribs = []
    if sampled_preprocessed is None:
        sampled_preprocessed = [[] for _ in components]

    def arr1(q):
        return tuple(np.array([x], np.uint32) for x in q)

    for ci, comp in enumerate(components):
        def tg(idx, offset, _ci=ci):
            assert offset == 0
            return Val(arr1(sampled_trace[_ci][idx][0]), True, HostArrayOps)

        def pg(idx, offset, _ci=ci):
            assert offset == 0
            return Val(arr1(sampled_preprocessed[_ci][idx][0]), True, HostArrayOps)

        def ig(idx, offset, _ci=ci):
            limbs = []
            for limb in range(4):
                col = sampled_interaction[_ci][4 * idx + limb]
                limbs.append(col[1] if offset == 0 else col[0])
            # limbs are QM31 samples of base-limb polys; recombine:
            acc = QZERO
            basis = [(1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0), (0, 0, 0, 1)]
            for limb, b in zip(limbs, basis):
                acc = qscalar_add(acc, qscalar_mul(tuple(limb), b))
            return Val(arr1(acc), True, HostArrayOps)

        shift = Val(
            arr1(logup_shift_scalar(claimed_sums[ci], comp.log_size)),
            True,
            HostArrayOps,
        )
        ev = EvalAtRow(HostArrayOps, tg, ig, shift, pg)
        comp.evaluate(ev)
        acc = None
        for c in ev.constraints:
            ce_limbs = c.as_ext().v
            ce = tuple(int(np.asarray(x).reshape(-1)[0]) for x in ce_limbs)
            acc = ce if acc is None else qscalar_add(
                qscalar_mul(acc, random_coeff), ce
            )
        counts.append(len(ev.constraints))
        vinv = _qscalar_inv(z_values[ci])
        contribs.append(qscalar_mul(acc, vinv))
    total = QZERO
    for i, c in enumerate(contribs):
        after = sum(counts[i + 1 :])
        total = qscalar_add(total, qscalar_mul(c, _qpow_scalar(random_coeff, after)))
    return total


def _qscalar_inv(v):
    from .fri import qscalar_inv

    return qscalar_inv(v)


def vanishing_at_qpoint(log_size: int, z):
    """V_l(z) = pi^(l-1)(z.x) for a QM31 point z (host scalar)."""
    x = z[0]
    for _ in range(log_size - 1):
        x2 = qscalar_mul(x, x)
        x = qscalar_sub_c(qscalar_add(x2, x2), 1)
    return x


def qscalar_sub_c(a, c):
    return ((a[0] - c) % P,) + tuple(a[1:])


# ---------------------------------------------------------------------------
# Trace-check debug tool
# ---------------------------------------------------------------------------


def assert_constraints(component, trace_rows, interaction_cols, claimed_sum,
                       preprocessed_rows=()):
    """Evaluate all constraints on the raw trace; returns list of
    (constraint_index, first_bad_row) for any violations."""
    n = 1 << component.log_size

    def tg(idx, offset):
        col = trace_rows[idx]
        return Val(np.roll(col, -offset) if offset else col, False, HostArrayOps)

    def pg(idx, offset):
        return Val(preprocessed_rows[idx], False, HostArrayOps)

    def ig(idx, offset):
        limbs = interaction_cols[idx]
        if offset:
            limbs = tuple(np.roll(x, -offset) for x in limbs)
        return Val(limbs, True, HostArrayOps)

    shift = Val(
        tuple(
            np.full(n, s, dtype=np.uint32)
            for s in logup_shift_scalar(claimed_sum, component.log_size)
        ),
        True,
        HostArrayOps,
    )
    ev = EvalAtRow(HostArrayOps, tg, ig, shift, pg)
    component.evaluate(ev)
    failures = []
    for k, c in enumerate(ev.constraints):
        v = c.as_ext().v
        bad = np.nonzero(
            (v[0] != 0) | (v[1] != 0) | (v[2] != 0) | (v[3] != 0)
        )
        if bad[0].size:
            failures.append((k, int(bad[-1][0])))
    return failures
