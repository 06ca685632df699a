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
from .fri import QZERO, qscalar_add, qscalar_mul, qscalar_mul_m31

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
# Composition (device)
# ---------------------------------------------------------------------------
# Per-component contribution kernels are jitted once per (component class,
# log_size, blowup); the relation parameters, logup shift and random coeff
# are traced *arguments* so new proofs hit the jit cache.

import jax

# jit per-component composition kernels (best for TPU / repeated shapes).
# Eager mode avoids XLA's slow compiles of huge modular-arithmetic graphs —
# the right default for CPU tests; flip on for TPU benching.
JIT_COMPONENTS = True

_COMP_FN_CACHE: dict = {}
_COUNT_CACHE: dict = {}


def _relations_pytree(relations):
    return {
        r.name: (
            jnp.asarray(np.array(r.z, np.uint32)),
            jnp.asarray(np.array(r.alpha_powers, np.uint32)),
        )
        for r in relations.all()
    }


def _bind_relations(relations, tree):
    saved = {}
    for r in relations.all():
        saved[r.name] = (r.z, r.alpha_powers)
        z_arr, a_arr = tree[r.name]
        r.z = tuple(z_arr[k] for k in range(4))
        r.alpha_powers = [
            tuple(a_arr[j, k] for k in range(4)) for j in range(r.arity)
        ]
    return saved


def _restore_relations(relations, saved):
    for r in relations.all():
        r.z, r.alpha_powers = saved[r.name]


def count_constraints(comp) -> int:
    key = (type(comp).__name__, comp.log_size)
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
        n = sum(lanes for _, lanes in ev.constraints)
    finally:
        _restore_relations(rel, saved)
    _COUNT_CACHE[key] = n
    return n


def _component_contrib_fn(comp, blowup: int):
    """Jitted f(tco, ico, pco, rel_tree, shift4, alpha4, vinv) ->
    4 x (n_ext,) contribution arrays (row order, divided by V)."""
    key = (type(comp).__name__, comp.log_size, blowup)
    if key in _COMP_FN_CACHE:
        return _COMP_FN_CACHE[key]
    l = comp.log_size
    elog = l + blowup
    roll = 1 << blowup

    def f(tco, ico, pco, rel_tree, shift4, alpha4, vinv):
        saved = _bind_relations(comp.relations, rel_tree)
        try:
            text = domain.from_fft_order(
                fft.fft(fft.embed_coeffs(tco, l, elog), elog)
            )
            iext = (
                domain.from_fft_order(
                    fft.fft(fft.embed_coeffs(ico, l, elog), elog)
                )
                if ico.shape[0]
                else ico
            )
            pext = (
                domain.from_fft_order(
                    fft.fft(fft.embed_coeffs(pco, l, elog), elog)
                )
                if pco.shape[0]
                else pco
            )

            def tg(idx, offset):
                col = text[idx]
                if offset:
                    # trace offset -k = index offset -k*blowup; previous row
                    # values sit at roll(+k*blowup)
                    col = jnp.roll(col, -roll * offset)
                return Val(col, False, DeviceOps)

            def ig(idx, offset):
                limbs = tuple(iext[4 * idx + k] for k in range(4))
                if offset:
                    limbs = tuple(jnp.roll(x, -roll * offset) for x in limbs)
                return Val(limbs, True, DeviceOps)

            def pg(idx, offset):
                return Val(pext[idx], False, DeviceOps)

            shift_val = Val(tuple(shift4[k] for k in range(4)), True, DeviceOps)
            ev = EvalAtRow(DeviceOps, tg, ig, shift_val, pg)
            comp.evaluate(ev)
            # alpha chain: acc = acc*alpha + C_k, respecting multi-lane
            # (stacked) constraints, which fold via a lax.scan (one-qmul
            # graph regardless of lane count).
            from ...field.qm31 import qmul as _qmul, qadd as _qadd

            n_ext = 1 << elog
            alpha_t = tuple(alpha4[k] for k in range(4))

            def scan_lanes(acc, stacked):
                # stacked: (m, 4, n_ext); acc: 4-tuple or None
                def chain(a, ck):
                    prod = _qmul(tuple(a[k] for k in range(4)), alpha_t)
                    new = _qadd(prod, tuple(ck[k] for k in range(4)))
                    return jnp.stack(new), None

                if acc is None:
                    init = stacked[0]
                    rest = stacked[1:]
                else:
                    init = jnp.stack(
                        _qadd(_qmul(acc, alpha_t), tuple(stacked[0][k] for k in range(4)))
                    )
                    rest = stacked[1:]
                out, _ = jax.lax.scan(chain, init, rest)
                return tuple(out[k] for k in range(4))

            accf = None
            for c, lanes in ev.constraints:
                ce = c.as_ext().v
                if lanes == 1:
                    ce = tuple(jnp.broadcast_to(x, (n_ext,)) for x in ce)
                    accf = (
                        ce if accf is None else _qadd(_qmul(accf, alpha_t), ce)
                    )
                else:
                    # ce limbs have shape (lanes, n_ext)
                    stacked = jnp.stack(
                        [jnp.broadcast_to(x, (lanes, n_ext)) for x in ce], axis=1
                    )  # (lanes, 4, n_ext)
                    accf = scan_lanes(accf, stacked)
            return tuple(m31.mul(accf[k], vinv) for k in range(4))
        finally:
            _restore_relations(comp.relations, saved)

    fn = jax.jit(f) if JIT_COMPONENTS else f
    _COMP_FN_CACHE[key] = fn
    return fn


@jax.jit
def _accumulate_coeffs(acc, new):
    return tuple(m31.add(a, b) for a, b in zip(acc, new))


from functools import lru_cache


@lru_cache(maxsize=None)
def _contrib_to_coeffs(elog: int, max_elog: int):
    def f(contrib, w4):
        weighted = _qmul_limbs(contrib, tuple(w4[k] for k in range(4)))
        return tuple(
            fft.embed_coeffs(
                fft.ifft(domain.to_fft_order(x), elog), elog, max_elog
            )
            for x in weighted
        )

    return jax.jit(f)


def _qmul_limbs(a, b):
    from ...field.qm31 import qmul

    return qmul(a, b)


def compute_composition(
    components, relations, trace_slices, inter_slices, pre_slices,
    claimed_sums, random_coeff, blowup=1,
):
    """-> (composition 4-limb tuple in fft order, log size max+blowup).

    trace_slices / inter_slices / pre_slices: per component, stacked device
    coefficient arrays of shape (k, 2^log_size) (k may be 0).
    """
    rel_tree = _relations_pytree(relations)
    alpha4 = jnp.asarray(np.array(random_coeff, np.uint32))
    counts = [count_constraints(c) for c in components]
    max_elog = max(c.log_size for c in components) + blowup
    total = None
    for i, comp in enumerate(components):
        l = comp.log_size
        elog = l + blowup
        shift4 = jnp.asarray(
            np.array(logup_shift_scalar(claimed_sums[i], l), np.uint32)
        )
        _, vinv = domain.vanishing_on_domain(l, elog)
        fn = _component_contrib_fn(comp, blowup)
        contrib = fn(
            trace_slices[i], inter_slices[i], pre_slices[i],
            rel_tree, shift4, alpha4, jnp.asarray(vinv),
        )
        after = sum(counts[i + 1 :])
        w4 = jnp.asarray(np.array(_qpow_scalar(random_coeff, after), np.uint32))
        co = _contrib_to_coeffs(elog, max_elog)(contrib, w4)
        total = co if total is None else _accumulate_coeffs(total, co)
    comp_evals = tuple(fft.fft(c, max_elog) for c in total)
    return comp_evals, max_elog


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
        n_constraints = 0
        for c, lanes in ev.constraints:
            ce_limbs = c.as_ext().v
            n_constraints += lanes
            if lanes == 1:
                ce = tuple(int(np.asarray(x).reshape(-1)[0]) for x in ce_limbs)
                acc = ce if acc is None else qscalar_add(
                    qscalar_mul(acc, random_coeff), ce
                )
            else:
                for j in range(lanes):
                    ce = tuple(
                        int(np.broadcast_to(np.asarray(x), (lanes, 1))[j, 0])
                        for x in ce_limbs
                    )
                    acc = ce if acc is None else qscalar_add(
                        qscalar_mul(acc, random_coeff), ce
                    )
        counts.append(n_constraints)
        vinv = _qscalar_inv(z_values[ci])
        contribs.append(qscalar_mul(acc, vinv))
    total = QZERO
    for i, c in enumerate(contribs):
        after = sum(counts[i + 1 :])
        total = qscalar_add(total, qscalar_mul(c, _qpow_scalar(random_coeff, after)))
    return total


def _qscalar_inv(v):
    r = qinv_np(tuple(np.array([x], np.uint32) for x in v))
    return tuple(int(x[0]) for x in r)


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
    k = 0
    for c, lanes in ev.constraints:
        v = c.as_ext().v
        bad = np.nonzero(
            (v[0] != 0) | (v[1] != 0) | (v[2] != 0) | (v[3] != 0)
        )
        if bad[0].size:
            failures.append((k + (int(bad[0][0]) if lanes > 1 else 0), int(bad[-1][0])))
        k += lanes
    return failures
