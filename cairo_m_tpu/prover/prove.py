"""prove_cairo_m: the full proof transcript (reference prover.rs:23-147).

Transcript order (§2.6 of SURVEY.md, adapted to this framework's PCS):

 1. config.mix_into(channel)
 2. PublicData.mix_into(channel)
 3. commit phase 0: preprocessed columns (range check tables, bitwise)
 4. write all component traces; mix each log_size (claim); commit phase 1
 5. interaction PoW grind(INTERACTION_POW_BITS); mix nonce
 6. Relations.draw; build LogUp interaction traces; mix claimed sums;
    commit phase 2
 7. composition_coeff = draw; compute composition; commit phase 3
 8. OODS point z from draw_felt; sample points per column
    (interaction columns also at z - g of their component)
 9. pcs.prove_values: mix samples, quotients, FRI, PoW, queries, decommit
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..field.qm31 import qinv_np
from .components.registry import ComponentSet
from .config import REGULAR_96_BITS
from .public_data import PublicData
from .relations import INTERACTION_POW_BITS, Relations
from .stark import domain, fft, framework, pcs
from .stark.channel import Blake2sChannel
from .stark.fri import QZERO, qscalar_add

P = (1 << 31) - 1


@dataclass
class Proof:
    log_sizes: list  # per component, registry order
    claimed_sums: list  # per component (QM31 tuples)
    public_data: PublicData
    interaction_pow_nonce: int
    pcs_proof: pcs.PcsProof

    def to_json_obj(self):
        return {
            "log_sizes": self.log_sizes,
            "claimed_sums": [list(c) for c in self.claimed_sums],
            "public_data": self.public_data.to_json_obj(),
            "interaction_pow_nonce": self.interaction_pow_nonce,
            "pcs_proof": self.pcs_proof.to_json_obj(),
        }

    @staticmethod
    def from_json_obj(o):
        return Proof(
            list(o["log_sizes"]),
            [tuple(c) for c in o["claimed_sums"]],
            PublicData.from_json_obj(o["public_data"]),
            o["interaction_pow_nonce"],
            pcs.PcsProof.from_json_obj(o["pcs_proof"]),
        )


def _fftify(col_np, log_size):
    """Row-order numpy column -> fft-order device column."""
    return domain.to_fft_order(jnp.asarray(col_np))


def oods_point_and_prevs(channel, log_sizes):
    """Draw t -> z; also z_prev per log size (z - trace step)."""
    t = channel.draw_felt()
    td = tuple(jnp.uint32(x) for x in t)
    x, y = domain.qpoint_from_t(td)
    z = (
        tuple(int(np.asarray(c)) for c in x),
        tuple(int(np.asarray(c)) for c in y),
    )
    prevs = {}
    for l in set(log_sizes):
        g = domain.point_at_index(domain.subgroup_gen_index(l))
        gneg = domain.qpoint_at_index_embedded(0)  # placeholder
        gx, gy = domain.point_neg(g)

        def emb(c):
            return (jnp.uint32(c), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0))

        zx = tuple(jnp.uint32(v) for v in z[0])
        zy = tuple(jnp.uint32(v) for v in z[1])
        px, py = domain.qpoint_add((zx, zy), (emb(gx), emb(gy)))
        prevs[l] = (
            tuple(int(np.asarray(c)) for c in px),
            tuple(int(np.asarray(c)) for c in py),
        )
    return z, prevs


def build_sample_points(comps: ComponentSet, z, z_prevs, pre_owners, max_elog):
    """Sample point lists for phases 0..3."""
    pre_points = []
    for comp, start, count in pre_owners:
        pre_points += [[z]] * count
    trace_points = []
    for comp in comps.all:
        trace_points += [[z]] * len_trace(comp)
    inter_points = []
    for comp in comps.all:
        n_limbs = 4 * comp.n_interaction_cols()
        inter_points += [[z_prevs[comp.log_size], z]] * n_limbs
    comp_points = [[z]] * 4
    return [pre_points, trace_points, inter_points, comp_points]


def len_trace(comp):
    return comp.n_trace_cols


def prove_cairo_m(prover_input, config=REGULAR_96_BITS, timing=None):
    t0 = time.time()
    channel = Blake2sChannel()
    config.mix_into(channel)

    public_data = PublicData.new(prover_input)
    public_data.mix_into(channel)

    relations = Relations()
    comps = ComponentSet(relations)
    comps.write_traces(prover_input)

    scheme = pcs.CommitmentSchemeProver(channel, config)

    # phase 0: preprocessed
    pre_cols, pre_owners = comps.preprocessed_columns()
    scheme.commit([(l, _fftify(c, l)) for l, c in pre_cols])

    # claim: mix log sizes; phase 1: trace
    for comp in comps.all:
        channel.mix_u64(comp.log_size)
    trace_cols, trace_owners = comps.trace_columns()
    scheme.commit([(l, _fftify(c, l)) for l, c in trace_cols])
    t_trace = time.time()

    # interaction PoW
    nonce = channel.grind(INTERACTION_POW_BITS)
    channel.mix_u64(nonce)

    # relations + interaction traces
    relations.draw(channel)
    claimed_sums = []
    inter_cols = []
    for comp in comps.all:
        pp = comp.preprocessed_columns() if comp.n_preprocessed_cols else ()
        cols, claimed = framework.gen_interaction_trace(comp, comp.trace_rows, pp)
        comp.interaction_cols = cols
        claimed_sums.append(claimed)
        for pair in cols:
            for limb in pair:
                inter_cols.append((comp.log_size, limb))
    channel.mix_felts(claimed_sums)
    scheme.commit([(l, _fftify(c, l)) for l, c in inter_cols])
    t_inter = time.time()

    # composition
    composition_coeff = channel.draw_felt()
    trace_phase = scheme.phases[1]
    inter_phase = scheme.phases[2]
    pre_phase = scheme.phases[0]
    # per-component stacked coefficient slices
    trace_slices, inter_slices, pre_slices = [], [], []
    ti = 0
    for comp in comps.all:
        trace_slices.append(trace_phase.coeff_slice(ti, comp.n_trace_cols))
        ti += comp.n_trace_cols
    ii = 0
    for comp in comps.all:
        k = 4 * comp.n_interaction_cols()
        inter_slices.append(inter_phase.coeff_slice(ii, k))
        ii += k
    pre_owner_map = {id(c): (s, n) for c, s, n in pre_owners}
    for comp in comps.all:
        if comp.n_preprocessed_cols:
            s0, n0 = pre_owner_map[id(comp)]
            pre_slices.append(pre_phase.coeff_slice(s0, n0))
        else:
            n_ = 1 << comp.log_size
            pre_slices.append(jnp.zeros((0, n_), jnp.uint32))
    comp_evals, comp_elog = framework.compute_composition(
        comps.all, relations, trace_slices, inter_slices, pre_slices,
        claimed_sums, composition_coeff,
        blowup=config.fri_config.log_blowup_factor,
    )
    # composition is a "trace" of log comp_elog committed with blowup
    scheme.commit([(comp_elog, c) for c in comp_evals])
    t_comp = time.time()

    # OODS
    z, z_prevs = oods_point_and_prevs(channel, comps.log_sizes())
    sample_points = build_sample_points(comps, z, z_prevs, pre_owners, comp_elog)
    pcs_proof = scheme.prove_values(sample_points)
    t_end = time.time()

    if timing is not None:
        timing.update(
            trace=t_trace - t0, interaction=t_inter - t_trace,
            composition=t_comp - t_inter, pcs=t_end - t_comp, total=t_end - t0,
        )

    return Proof(
        log_sizes=comps.log_sizes(),
        claimed_sums=claimed_sums,
        public_data=public_data,
        interaction_pow_nonce=nonce,
        pcs_proof=pcs_proof,
    )
