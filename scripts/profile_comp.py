"""Micro-profile the composition + interaction phases per component on the
TPU: which components cost wall time, and is it dispatch latency or compute?
Runs fib(N) once (N from argv, default 100000).
"""
import os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

t00 = time.time()
def log(msg):
    print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)

np.asarray(jnp.zeros(8, jnp.uint32))
log("claim done")

from cairo_m_tpu.compiler import compile_cairo
from cairo_m_tpu.prover.adapter.native_import import native_prover_input
from cairo_m_tpu.prover.config import REGULAR_96_BITS
from cairo_m_tpu.prover import prove as prove_mod
from cairo_m_tpu.prover.stark import domain, fft, framework, pcs
from cairo_m_tpu.prover.components.registry import ComponentSet
from cairo_m_tpu.prover.relations import Relations, INTERACTION_POW_BITS
from cairo_m_tpu.prover.public_data import PublicData
from cairo_m_tpu.prover.stark.channel import Blake2sChannel

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
SRC = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""
program = compile_cairo(SRC).program
pi = native_prover_input(program, "main", [N])
log(f"adapter done, steps={pi.total_steps}")

config = REGULAR_96_BITS
channel = Blake2sChannel()
config.mix_into(channel)
public_data = PublicData.new(pi)
public_data.mix_into(channel)
relations = Relations()
comps = ComponentSet(relations)
comps.write_traces(pi)
log("write_traces done; log_sizes=" + ",".join(
    f"{c.name}:{c.log_size}" for c in comps.all if c.log_size > 6))

scheme = pcs.CommitmentSchemeProver(channel, config)
pre_cols, pre_owners = comps.preprocessed_columns()
t = time.time(); scheme.commit([(l, prove_mod._fftify(c, l)) for l, c in pre_cols])
log(f"phase0 commit {time.time()-t:.2f}s")
for comp in comps.all:
    channel.mix_u64(comp.log_size)
t = time.time()
trace_stacks = [jnp.asarray(np.stack(comp.trace_rows)) for comp in comps.all]
for st in trace_stacks: st.block_until_ready()
log(f"trace upload {time.time()-t:.2f}s")
t = time.time()
scheme.commit([(comp.log_size, domain.to_fft_order(st))
               for comp, st in zip(comps.all, trace_stacks)])
log(f"phase1 commit {time.time()-t:.2f}s")

nonce = channel.grind(INTERACTION_POW_BITS)
channel.mix_u64(nonce)
relations.draw(channel)

# --- interaction per component, synchronized ---
claimed_dev, inter_entries = [], []
tot = 0.0
for comp, st in zip(comps.all, trace_stacks):
    pp = comp.preprocessed_columns() if comp.n_preprocessed_cols else ()
    pre_stack = (jnp.asarray(np.stack(pp)) if pp
                 else jnp.zeros((0, 1 << comp.log_size), jnp.uint32))
    t = time.time()
    stacked, claimed = framework.gen_interaction_trace_device(comp, st, pre_stack)
    stacked.block_until_ready()
    dt = time.time() - t
    tot += dt
    if dt > 0.05:
        log(f"  inter {comp.name} log={comp.log_size}: {dt*1000:.0f} ms")
    claimed_dev.append(claimed)
    inter_entries.append((comp.log_size, domain.to_fft_order(stacked)))
log(f"interaction total {tot:.2f}s")
claimed_np = np.asarray(jnp.stack(claimed_dev))
claimed_sums = [tuple(int(x) for x in row) for row in claimed_np]
channel.mix_felts(claimed_sums)
t = time.time(); scheme.commit(inter_entries)
log(f"phase2 commit {time.time()-t:.2f}s")

composition_coeff = channel.draw_felt()
pre_owner_map = {id(c): (s, n) for c, s, n in pre_owners}

# --- composition per component, synchronized (inline of compute_composition) ---
from cairo_m_tpu.prover.stark.framework import (
    count_constraints, composition_plan, _DynResolver, _qpow_scalar,
    _weight_contrib, _accumulate_limbs, _evals_to_coeffs)
from cairo_m_tpu.prover.stark.air import logup_shift_scalar
from cairo_m_tpu.prover.stark.fri import QONE, qscalar_mul
from cairo_m_tpu.prover.stark.wtape import run_wide

blowup = config.fri_config.log_blowup_factor
components = comps.all
counts = [count_constraints(c) for c in components]
max_elog = max(c.log_size for c in components) + blowup
apows = [QONE]
for _ in range(max(counts)):
    apows.append(qscalar_mul(apows[-1], composition_coeff))
ti = ii = 0
by_elog = {}
trace_phase, inter_phase, pre_phase = scheme.phases[1], scheme.phases[2], scheme.phases[0]
tot = 0.0
for i, comp in enumerate(components):
    l = comp.log_size
    elog = l + blowup
    n = 1 << elog
    t = time.time()
    plan = composition_plan(comp, relations)
    consts = plan.const_values(_DynResolver(
        relations, shift=logup_shift_scalar(claimed_sums[i], l), apows=apows))
    text = trace_phase.stacked_ext[elog]
    iext = inter_phase.stacked_ext[elog]
    pext = pre_phase.stacked_ext.get(elog)
    if pext is None:
        pext = jnp.zeros((0, n), jnp.uint32)
    Kt, Ki, Kp = int(text.shape[0]), int(iext.shape[0]), int(pext.shape[0])
    pre_start = pre_owner_map.get(id(comp), (0, 0))[0]
    roll = 1 << blowup
    src = np.zeros(len(plan.used_bank), np.int32)
    sh = np.zeros(len(plan.used_bank), np.uint32)
    for j, (kind, idx, offset) in enumerate(plan.used_bank):
        if kind == "t":
            _, pos = trace_phase.group_index[ti + idx]; src[j] = pos
        elif kind == "i":
            _, pos = inter_phase.group_index[ii + idx]; src[j] = Kt + pos
        elif kind == "p":
            _, pos = pre_phase.group_index[pre_start + idx]; src[j] = Kt + Ki + pos
        else:
            src[j] = Kt + Ki + Kp
        sh[j] = (roll * offset) % n
    _, vinv = domain.vanishing_on_domain(l, elog)
    vrow = jnp.asarray(domain.to_fft_order(vinv)[None])
    out = run_wide((text, iext, pext, vrow), src, sh, consts, plan, elog)
    contrib = tuple(out[k] for k in range(4))
    after = sum(counts[i + 1:])
    w4 = jnp.asarray(np.array(_qpow_scalar(composition_coeff, after), np.uint32))
    acc = by_elog.get(elog)
    weighted = _weight_contrib(contrib, w4)
    by_elog[elog] = weighted if acc is None else _accumulate_limbs(acc, weighted)
    by_elog[elog][0].block_until_ready()
    dt = time.time() - t
    tot += dt
    if dt > 0.05:
        log(f"  comp {comp.name} log={l} B={len(plan.used_bank)} S={plan.n_steps}: {dt*1000:.0f} ms")
    ti += comp.n_trace_cols
    ii += 4 * comp.n_interaction_cols()
log(f"composition per-comp total {tot:.2f}s")
t = time.time()
total = None
for elog in sorted(by_elog, reverse=True):
    co = _evals_to_coeffs(elog, max_elog)(by_elog[elog])
    total = co if total is None else prove_mod.framework._accumulate_coeffs(total, co)
tw = fft.twiddles_dev(max_elog, False)
comp_evals = tuple(fft.fft(c, max_elog, tw) for c in total)
comp_evals[0].block_until_ready()
log(f"composition ifft/fft tail {time.time()-t:.2f}s")
t = time.time()
scheme.commit([(max_elog, jnp.stack(comp_evals))])
log(f"phase3 commit {time.time()-t:.2f}s")

z, z_prevs = prove_mod.oods_point_and_prevs(channel, comps.log_sizes())
sample_points = prove_mod.build_sample_points(comps, z, z_prevs, pre_owners, max_elog)
os.environ["CM_DEBUG_PHASES"] = "1"
t = time.time()
pcs_proof = scheme.prove_values(sample_points)
log(f"pcs prove_values {time.time()-t:.2f}s")
log("DONE")
