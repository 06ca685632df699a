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

from .components.registry import ComponentSet
from .config import REGULAR_96_BITS
from .public_data import PublicData
from .relations import INTERACTION_POW_BITS, Relations
from .stark import domain, fft, framework, pcs
from .stark.channel import Blake2sChannel
from .stark.fri import QZERO, qscalar_add

P = (1 << 31) - 1

# (scale key, blowup, mesh id) -> CommitmentPhase of the preprocessed tables
_PRE_PHASE_CACHE: dict = {}
# (comp name, scale key, mesh key) -> row-order device stack of the
# component's preprocessed columns (rc enumerations, bitwise tables): fixed
# per protocol scale, so uploading them per prove wasted ~4 MB of H2D (the
# rc20 enumeration) on a ~25 MB/s accelerator tunnel
_PRE_STACK_CACHE: dict = {}


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

    def program_id(self) -> int:
        """Poseidon2 Merkle root over just the program's public memory
        entries — a succinct program identity derivable from any proof
        (reference `Proof::program_id`, crates/prover/src/lib.rs:76-98:
        rebuild an addr->value map from public_data.program, hash it as an
        initial-type partial tree with no public addresses)."""
        from ..isa.program import PublicAddressRanges
        from .adapter.merkle import build_partial_merkle_tree

        mem = {
            addr: (tuple(val), 0, 0)
            for addr, val, _clock in self.public_data.program
        }
        _, root = build_partial_merkle_tree(
            mem, "initial", PublicAddressRanges()
        )
        return root


def _fftify(col_np, log_size):
    """Row-order numpy column -> fft-order device column (sharded over the
    active mesh's domain axis, if any — parallel/sharded.py)."""
    from ..parallel.sharded import maybe_shard

    return domain.to_fft_order(maybe_shard(jnp.asarray(col_np)))


def _qscalar_inv(v):
    from .stark.fri import qscalar_inv

    return qscalar_inv(v)


def oods_point_and_prevs(channel, log_sizes):
    """Draw t -> z; also z_prev per log size (z - trace step).

    Pure host scalar arithmetic — the device version dispatched ~750 tiny
    eager ops (the Fermat inverse chain) over the accelerator tunnel."""
    from .stark.fri import qscalar_add, qscalar_mul, qscalar_sub

    t = channel.draw_felt()
    one = (1, 0, 0, 0)
    t2 = qscalar_mul(t, t)
    dinv = _qscalar_inv(qscalar_add(one, t2))
    zx = qscalar_mul(qscalar_sub(one, t2), dinv)
    zy = qscalar_mul(qscalar_add(t, t), dinv)
    z = (zx, zy)
    prevs = {}
    for l in set(log_sizes):
        gx, gy = domain.point_neg(
            domain.point_at_index(domain.subgroup_gen_index(l))
        )
        # z + (-g) over QM31 with a base-field point
        px = qscalar_sub(
            qscalar_mul_m31_t(zx, gx), qscalar_mul_m31_t(zy, gy)
        )
        py = qscalar_add(
            qscalar_mul_m31_t(zx, gy), qscalar_mul_m31_t(zy, gx)
        )
        prevs[l] = (px, py)
    return z, prevs


def qscalar_mul_m31_t(a, s: int):
    return tuple((x * s) % P for x in a)


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


import os as _os

_DEBUG_PHASES = bool(_os.environ.get("CM_DEBUG_PHASES"))


def _dbg(t0, msg):
    if _DEBUG_PHASES:
        print(f"[prove +{time.time()-t0:7.2f}s] {msg}", flush=True)


def prove_cairo_m(prover_input, config=REGULAR_96_BITS, timing=None):
    t0 = time.time()
    channel = config.make_channel()
    config.mix_into(channel)

    public_data = PublicData.new(prover_input)
    public_data.mix_into(channel)

    relations = Relations()
    comps = ComponentSet(relations)
    _dbg(t0, "public data")
    # Witness generation pipelined with upload: each component's packed
    # planes (stark/colpack.py) start their async H2D transfer the moment
    # its rows exist, so the ~25 MB/s tunnel moves data while the host is
    # still generating later components' witnesses.  Zero-witness
    # components upload nothing (their stacks are device-side zero fills
    # below).  Single-device proves also move the range-check/bitwise
    # multiplicity histograms to device scatter-adds over the uploaded
    # stacks (framework.TableCounter) — the host entry re-derivation was a
    # serial trace-phase cost; the sharded path keeps host histograms.
    from ..parallel.sharded import active_mesh as _active_mesh
    from ..parallel.sharded import maybe_shard
    from .config import SCALE as _SCALE
    from .stark import colpack

    counter = (
        None
        if _active_mesh() is not None
        else framework.TableCounter(relations, *_SCALE.key())
    )
    uploaded = {}
    _wt = {"pack": 0.0, "count": 0.0}

    def _upload(comp):
        dev = getattr(comp, "device_stack", None)
        if comp.trace_rows is None:
            if dev is not None:
                uploaded[id(comp)] = dev
            return
        if comp.zero_witness:
            return
        tu = time.time()
        st = maybe_shard(
            colpack.upload_stack(comp.trace_rows, comp.non_padded_length)
        )
        _wt["pack"] += time.time() - tu
        uploaded[id(comp)] = st
        if counter is not None:
            tu = time.time()
            counter.add(comp, st)
            _wt["count"] += time.time() - tu

    comps.write_traces(
        prover_input, on_component=_upload, table_counter=counter
    )
    _dbg(t0, f"write_traces (host, uploads pipelined; pack "
             f"{_wt['pack']:.2f}s count {_wt['count']:.2f}s)")

    scheme = pcs.CommitmentSchemeProver(channel, config)

    # phase 0: preprocessed.  The columns (range-check enumerations, the
    # bitwise table) are fixed per protocol scale, so their entire
    # commitment phase — LDE, commit-order transform, Merkle trees — is
    # computed once per (scale, blowup, mesh) and reused across proofs;
    # only the root mixing into the channel runs per proof.
    pre_cols, pre_owners = comps.preprocessed_columns()
    from .config import SCALE
    from ..parallel.sharded import active_mesh

    # stable mesh descriptor, not id(): a GC'd mesh's address can be reused
    # by a new mesh whose sharding differs (ADVICE r4 #2)
    mesh = active_mesh()
    mesh_key = (
        None
        if mesh is None
        else (
            tuple(d.id for d in mesh.devices.flat),
            mesh.devices.shape,
            mesh.axis_names,
        )
    )
    pre_key = (
        SCALE.key(), config.fri_config.log_blowup_factor, mesh_key,
        config.framing,
    )
    cached = _PRE_PHASE_CACHE.get(pre_key)
    if cached is None:
        cached = pcs.CommitmentPhase(
            [(l, _fftify(c, l)) for l, c in pre_cols],
            config.fri_config.log_blowup_factor,
            framing=config.framing,
        )
        _PRE_PHASE_CACHE.clear()  # hold at most one scale's tables in HBM
        _PRE_PHASE_CACHE[pre_key] = cached
    scheme.commit_phase(cached)
    _dbg(t0, "phase0 commit")

    # claim: mix log sizes; phase 1: trace.  Each component's trace stack
    # was uploaded (async, packed — stark/colpack.py) during write_traces
    # above; the commit reuses it (FFT order is a pure device slicing), as
    # do the witness tape kernels below.
    for comp in comps.all:
        channel.mix_u64(comp.log_size)
    trace_stacks = [
        jnp.zeros((comp.n_trace_cols, 1 << comp.log_size), jnp.uint32)
        if comp.zero_witness
        else uploaded[id(comp)]
        for comp in comps.all
    ]
    scheme.commit(
        [
            (
                comp.log_size,
                st if comp.zero_witness else domain.to_fft_order(st),
            )
            for comp, st in zip(comps.all, trace_stacks)
        ]
    )
    _dbg(t0, "phase1 trace commit")
    t_trace = time.time()

    # interaction PoW
    nonce = channel.grind(INTERACTION_POW_BITS)
    channel.mix_u64(nonce)

    # relations + interaction traces (device tape path; columns stay stacked)
    relations.draw(channel)
    claimed_dev = []
    inter_entries = []
    zero_claims = set()
    for ci, (comp, st) in enumerate(zip(comps.all, trace_stacks)):
        n = 1 << comp.log_size
        if comp.zero_witness:
            # numerators are products with all-zero trace columns, so every
            # fraction, prefix column and the claimed sum are identically 0
            # (validated: tests/test_constraints.py::test_zero_witness_*).
            stacked = jnp.zeros((4 * comp.n_interaction_cols(), n), jnp.uint32)
            zero_claims.add(ci)
            inter_entries.append((comp.log_size, stacked))
            continue
        if comp.n_preprocessed_cols:
            ps_key = (comp.name, SCALE.key(), mesh_key)
            pre_stack = _PRE_STACK_CACHE.get(ps_key)
            if pre_stack is None:
                if len(_PRE_STACK_CACHE) > 64:
                    _PRE_STACK_CACHE.clear()
                pp = comp.preprocessed_columns()
                pre_stack = maybe_shard(jnp.asarray(np.stack(pp)))
                _PRE_STACK_CACHE[ps_key] = pre_stack
        else:
            pre_stack = jnp.zeros((0, n), jnp.uint32)
        stacked, claimed = framework.gen_interaction_trace_device(
            comp, st, pre_stack
        )
        claimed_dev.append(claimed)
        inter_entries.append((comp.log_size, domain.to_fft_order(stacked)))
    # one batched device->host pull for every non-zero component's sum
    claimed_np = (
        np.asarray(jnp.stack(claimed_dev))
        if claimed_dev
        else np.zeros((0, 4), np.uint32)
    )
    claimed_sums = []
    it = iter(claimed_np)
    for ci in range(len(comps.all)):
        claimed_sums.append(
            (0, 0, 0, 0) if ci in zero_claims else tuple(int(x) for x in next(it))
        )
    _dbg(t0, "interaction traces")
    channel.mix_felts(claimed_sums)
    scheme.commit(inter_entries)
    _dbg(t0, "phase2 commit")
    t_inter = time.time()

    # composition
    composition_coeff = channel.draw_felt()
    pre_owner_map = {id(c): (s, n) for c, s, n in pre_owners}
    comp_evals, comp_elog = framework.compute_composition(
        comps.all, relations,
        scheme.phases[0], scheme.phases[1], scheme.phases[2],
        pre_owner_map, claimed_sums, composition_coeff,
        blowup=config.fri_config.log_blowup_factor,
    )
    _dbg(t0, "composition computed")
    # composition is a "trace" of log comp_elog committed with blowup
    scheme.commit([(comp_elog, jnp.stack(comp_evals))])
    _dbg(t0, "phase3 commit")
    t_comp = time.time()

    # OODS
    z, z_prevs = oods_point_and_prevs(channel, comps.log_sizes())
    sample_points = build_sample_points(comps, z, z_prevs, pre_owners, comp_elog)
    pcs_proof = scheme.prove_values(sample_points)
    _dbg(t0, "pcs prove_values")
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
