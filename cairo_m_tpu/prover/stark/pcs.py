"""Polynomial commitment scheme: commit phases -> OODS sampling -> DEEP
quotients -> FRI -> PoW -> query decommitment.

Role of stwo's `CommitmentSchemeProver/Verifier` + `core::prover::{prove,
verify}` glue (SURVEY.md §2.9, §2.6 step 9).  A *phase* is one logical
commitment (preprocessed / trace / interaction / composition) holding many
M31 columns; per phase one Merkle tree per log_size, roots mixed
largest-first.  Transcript order within `prove_values`:

1. mix all sampled values (canonical (phase, column, point) order);
2. ``random_coeff = draw`` (quotient alpha);
3. FRI commit on the quotient columns (mixes layer roots, draws alphas);
4. PoW: ``nonce = grind(pow_bits)``; ``mix_u64(nonce)``;
5. ``queries = draw_queries(n_queries, max_log)``;
6. decommit every phase tree and FRI layer at the query pair positions.

The verifier replays the same transcript and checks Merkle openings, FRI
folds, the last-layer degree, and the PoW.
"""

from __future__ import annotations

import os as _os
import time as _time
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from . import domain, fft, fri, merkle, quotients

# CM_DEBUG_MICRO: per-piece wall times with device sync (block_until_ready)
# after each stage — attribution only; the syncs serialize the pipeline, so
# totals under this flag exceed production wall time.
_MICRO = bool(_os.environ.get("CM_DEBUG_MICRO"))


def _micro(t0, msg):
    if _MICRO:
        print(f"    [micro +{_time.time()-t0:6.3f}s] {msg}", flush=True)
    return _time.time()


@lru_cache(maxsize=None)
def _commit_pipeline(trace_log: int, commit_log: int):
    """Jitted: (k, 2^trace_log) fft-order stack ->
    (coeffs, fft-order LDE, commit-order LDE).

    The fft-order LDE is kept on the phase so the composition tape kernels
    (stark/wtape.py) reuse it instead of re-extending columns.  Twiddles are
    jit *arguments* (device-resident, shared across executables), not baked
    constants — at commit_log >= 22 baked twiddles OOM'd HBM."""

    def f(stacked, itw, tw):
        coeffs = fft.ifft(stacked, trace_log, itw)
        # optimization_barrier between stages: near-free (all three results
        # are outputs and materialize anyway) and it limits the blast
        # radius of XLA TPU miscompiles of fused transform chains — one
        # such bug (non-multiple-of-8 batch dims through the two-stage FFT
        # transposes, fixed by fft._pad_lead) silently zeroed part of a
        # committed column and was only caught as a CPU-vs-TPU proof diff.
        coeffs = jax.lax.optimization_barrier(coeffs)
        ext = fft.fft(
            fft.embed_coeffs(coeffs, trace_log, commit_log), commit_log, tw
        )
        ext = jax.lax.optimization_barrier(ext)
        return coeffs, ext, domain.bit_reverse(ext, commit_log)

    jitted = jax.jit(f)

    def call(stacked):
        return jitted(
            stacked,
            fft.twiddles_dev(trace_log, True),
            fft.twiddles_dev(commit_log, False),
        )

    return call

P = (1 << 31) - 1


@dataclass
class PcsConfig:
    pow_bits: int = 16
    fri_config: fri.FriConfig = field(default_factory=fri.FriConfig)
    # "native": this framework's channel framing + one dense Merkle tree per
    # (phase, log_size) group (PROTOCOL.md §2.2-2.3, the TPU fast path).
    # "stwo": stwo's Blake2sChannel byte framing + one mixed-degree tree per
    # phase with Blake2sMerkleHasher compress framing (stwo_channel.py,
    # stwo_merkle.py — the bit-parity backend, PROTOCOL.md §3).
    framing: str = "native"

    def make_channel(self):
        if self.framing == "stwo":
            from .stwo_channel import StwoBlake2sChannel

            return StwoBlake2sChannel()
        from .channel import Blake2sChannel

        return Blake2sChannel()

    def mix_into(self, channel):
        channel.mix_u64(self.pow_bits)
        channel.mix_u64(self.fri_config.log_blowup_factor)
        channel.mix_u64(self.fri_config.log_last_layer_degree_bound)
        channel.mix_u64(self.fri_config.n_queries)

    def security_bits(self) -> int:
        return (
            self.pow_bits
            + self.fri_config.log_blowup_factor * self.fri_config.n_queries
        )


# REGULAR_96_BITS (reference prover_config.rs:13-20)
REGULAR_96_BITS = PcsConfig(
    pow_bits=16,
    fri_config=fri.FriConfig(
        log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=80
    ),
)


class CommitmentPhase:
    """One committed phase: columns grouped by log_size, one jitted LDE +
    one Merkle tree per group."""

    def __init__(self, columns_fft, log_blowup: int, framing: str = "native"):
        """columns_fft: list of (trace_log_size, fft-order M31 evals) —
        1-D entries are single columns, 2-D entries are (k, n) stacks of k
        columns of that log size (the fast path: per-column device slicing
        costs one XLA eager compile *per index*, so callers keep columns
        stacked end-to-end).

        Each column is LDE'd by the blowup and committed on the extended
        domain.  The *commit log size* of a column = trace_log + blowup.

        ``framing="stwo"`` commits all columns in ONE mixed-degree tree
        (stwo_merkle.py) instead of one tree per log_size; the FFT/LDE
        device pipeline is shared.
        """
        self.framing = framing
        self.trace_logs = []
        # group columns by trace log (stable order within group)
        self.group_index = {}  # column index -> (trace_log, position in group)
        groups: dict[int, list] = {}
        counts: dict[int, int] = {}
        for l, arr in columns_fft:
            l = int(l)
            arr2 = arr[None] if arr.ndim == 1 else arr
            k = int(arr2.shape[0])
            base = counts.get(l, 0)
            for j in range(k):
                self.group_index[len(self.trace_logs)] = (l, base + j)
                self.trace_logs.append(l)
            counts[l] = base + k
            groups.setdefault(l, []).append(arr2)
        self.commit_logs = [l + log_blowup for l in self.trace_logs]
        self.stacked_coeffs = {}  # trace_log -> (k, n) device
        self.stacked_ext = {}  # commit_log -> (k, 2n) device, FFT order
        self.stacked_commit = {}  # commit_log -> (k, 2n) device, commit order
        self.trees = {}
        tm = _time.time()
        for l in sorted(groups, reverse=True):
            cl = l + log_blowup
            pieces = groups[l]
            stacked = (
                pieces[0]
                if len(pieces) == 1
                else jnp.concatenate(pieces, axis=0)
            )
            coeffs, ext_cols, commit_cols = _commit_pipeline(l, cl)(stacked)
            if _MICRO:
                jax.block_until_ready(commit_cols)
                tm = _micro(
                    tm, f"fft k={int(stacked.shape[0])} log={l}->{cl}"
                )
            self.stacked_coeffs[l] = coeffs
            self.stacked_ext[cl] = ext_cols
            self.stacked_commit[cl] = commit_cols
            if framing == "stwo":
                continue
            self.trees[cl] = merkle.MerkleTree(commit_cols, defer_top=True)
            if _MICRO:
                jax.block_until_ready(self.trees[cl].top_dev)
                tm = _micro(tm, f"merkle k={int(stacked.shape[0])} cl={cl}")
        if framing == "stwo":
            # one mixed-degree tree over ALL columns in phase column order
            # (host-side — the stwo backend is the framing-parity path,
            # PROTOCOL.md §3; the grouped trees above are the TPU fast path)
            from . import stwo_merkle

            pulled = {
                cl: np.asarray(self.stacked_commit[cl])
                for cl in self.stacked_commit
            }
            cols = []
            for ci in range(len(self.trace_logs)):
                l, pos = self.group_index[ci]
                cols.append(pulled[l + log_blowup][pos])
            self.stwo_tree = stwo_merkle.StwoMerkleTree(cols)
            _micro(tm, "stwo mixed-degree tree")
            return
        # ONE device->host pull for every tree's top level, then the host
        # pyramids (a sync pull costs 27-80 ms over the tunnel)
        logs = sorted(self.trees, reverse=True)
        if logs:
            tops = np.asarray(
                jnp.concatenate([self.trees[cl].top_dev for cl in logs], axis=1)
            )
            off = 0
            for cl in logs:
                m = int(self.trees[cl].top_dev.shape[1])
                self.trees[cl].finish_host(tops[:, off : off + m])
                off += m
            _micro(tm, "top pull + host pyramids")

    def coeff_slice(self, start: int, count: int):
        """Stacked coefficient rows for columns [start, start+count), which
        must all share one log_size and be contiguous in their group."""
        if count == 0:
            n = 1 << (self.trace_logs[0] if self.trace_logs else 4)
            return jnp.zeros((0, n), jnp.uint32)
        l0, p0 = self.group_index[start]
        for i in range(count):
            l, p = self.group_index[start + i]
            assert l == l0 and p == p0 + i, "non-contiguous coeff slice"
        return self.stacked_coeffs[l0][p0 : p0 + count]

    def roots(self):
        if self.framing == "stwo":
            return [(max(self.commit_logs), self.stwo_tree.root())]
        return [(cl, self.trees[cl].root()) for cl in sorted(self.trees, reverse=True)]

    def mix_roots(self, channel):
        """Mix all tree roots largest-first (stwo framing: the single
        mixed-degree root).  Every tree's root is already host-side:
        __init__ batch-pulls the deferred tops and finish_host()es each, so
        a tree reaching here with _root unset is a bug (the old root_dev
        fallback read an attribute that is always None now — ADVICE r4 #3)."""
        if self.framing == "stwo":
            channel.mix_root(self.stwo_tree.root())
            return
        logs = sorted(self.trees, reverse=True)
        for cl in logs:
            t = self.trees[cl]
            if t._root is None:
                # defer_top tree whose finish_host was skipped: complete it
                # from its device top rather than crash on a None stack
                t.finish_host(np.asarray(t.top_dev))
        for _, r in self.roots():
            channel.mix_root(r)

    def sample_dispatch(self, points_per_column):
        """Queue the point-evaluation kernels for this phase; returns an
        opaque (jobs, devs) handle for `sample_finish`.  All columns of one
        log_size in a phase must share the same point list (the protocol
        guarantees it): one stacked jitted evaluation per (log, point)."""
        jobs = {}
        for ci, (l, pts) in enumerate(zip(self.trace_logs, points_per_column)):
            for pi_, z in enumerate(pts):
                jobs.setdefault((l, z), []).append((ci, pi_))
        devs = []
        for (l, z), lst in jobs.items():
            coeffs = self.stacked_coeffs[l]
            tws = fft.point_eval_twiddles_host(z, l)
            v = _eval_stack(l)(coeffs, jnp.asarray(tws))
            devs.append(jnp.stack(v).reshape(-1))  # (4*k,)
        return jobs, devs, len(points_per_column)

    def sample_finish(self, handle, flat: np.ndarray, off: int):
        """Assemble sampled values from the (already pulled) flat array
        starting at ``off``; returns (values, new offset)."""
        jobs, devs, n_cols = handle
        sizes = {}
        for lst in jobs.values():
            for ci, pi_ in lst:
                sizes[ci] = max(sizes.get(ci, 0), pi_ + 1)
        out = [[None] * sizes.get(ci, 0) for ci in range(n_cols)]
        for (l, z), lst in jobs.items():
            k = int(self.stacked_coeffs[l].shape[0])
            vh = flat[off : off + 4 * k].reshape(4, k)
            off += 4 * k
            for ci, pi_ in lst:
                _, pos = self.group_index[ci]
                out[ci][pi_] = tuple(int(vh[j][pos]) for j in range(4))
        return out, off

    def sample(self, points_per_column):
        """Evaluate columns at sample points with ONE device->host pull
        (single-phase convenience; `prove_values` batches all phases)."""
        handle = self.sample_dispatch(points_per_column)
        devs = handle[1]
        flat = (
            np.asarray(jnp.concatenate(devs)) if devs else np.zeros(0)
        )
        out, _ = self.sample_finish(handle, flat, 0)
        return out


@lru_cache(maxsize=None)
def _eval_stack(log_size: int):
    return jax.jit(
        lambda coeffs, tws: fft.eval_at_qpoint_folds(coeffs, log_size, tws)
    )


def _dec_from_json(phase_obj):
    """Deserialize a per-phase decommitment: stwo opening (tagged with
    ``format: stwo``) or the native per-log_size MerkleDecommitment map."""
    if isinstance(phase_obj, dict) and phase_obj.get("format") == "stwo":
        from .stwo_merkle import StwoPhaseOpening

        return StwoPhaseOpening.from_json_obj(phase_obj)
    return {
        int(l): merkle.MerkleDecommitment.from_json_obj(d)
        for l, d in phase_obj.items()
    }


@dataclass
class PcsProof:
    phase_roots: list  # per phase: [(commit_log, root_bytes)]
    sampled_values: list  # per phase: [col][point] qm31 tuple
    decommitments: list  # per phase: {commit_log: MerkleDecommitment}
    fri_proof: fri.FriProof
    pow_nonce: int

    def to_json_obj(self):
        return {
            "phase_roots": [
                [[l, r.hex()] for l, r in phase] for phase in self.phase_roots
            ],
            "sampled_values": [
                [[list(v) for v in col] for col in phase]
                for phase in self.sampled_values
            ],
            "decommitments": [
                phase.to_json_obj()
                if hasattr(phase, "to_json_obj")
                else {str(l): d.to_json_obj() for l, d in phase.items()}
                for phase in self.decommitments
            ],
            "fri_proof": self.fri_proof.to_json_obj(),
            "pow_nonce": self.pow_nonce,
        }

    @staticmethod
    def from_json_obj(o):
        return PcsProof(
            [[(l, bytes.fromhex(r)) for l, r in phase] for phase in o["phase_roots"]],
            [
                [[tuple(v) for v in col] for col in phase]
                for phase in o["sampled_values"]
            ],
            [
                _dec_from_json(phase)
                for phase in o["decommitments"]
            ],
            fri.FriProof.from_json_obj(o["fri_proof"]),
            o["pow_nonce"],
        )


class CommitmentSchemeProver:
    def __init__(self, channel, config: PcsConfig = REGULAR_96_BITS):
        self.channel = channel
        self.config = config
        self.phases: list[CommitmentPhase] = []

    def commit(self, columns_fft):
        """Commit a phase; mixes its roots into the channel."""
        phase = CommitmentPhase(
            columns_fft,
            self.config.fri_config.log_blowup_factor,
            framing=self.config.framing,
        )
        return self.commit_phase(phase)

    def commit_phase(self, phase: CommitmentPhase):
        """Commit an already-built phase (e.g. the cached preprocessed
        tables, whose columns are proof-independent)."""
        phase.mix_roots(self.channel)
        self.phases.append(phase)
        return len(self.phases) - 1

    def prove_values(self, sample_points) -> PcsProof:
        """sample_points: per phase, per column, list of QM31 circle points."""
        import os, time

        dbg = os.environ.get("CM_DEBUG_PHASES")
        t0 = time.time()

        def _t(msg):
            nonlocal t0
            if dbg:
                print(f"  [pcs +{time.time()-t0:6.2f}s] {msg}", flush=True)
            t0 = time.time()

        channel = self.channel
        for phase, pts in zip(self.phases, sample_points):
            assert len(pts) == len(phase.trace_logs), (
                "sample points don't cover every committed column "
                f"({len(pts)} vs {len(phase.trace_logs)})"
            )
        # 1. sample + mix — all phases' point evaluations queued first, then
        # ONE device->host pull for everything (a sync pull costs ~27 ms of
        # tunnel latency, and there are 4 phases)
        handles = [
            phase.sample_dispatch(pts)
            for phase, pts in zip(self.phases, sample_points)
        ]
        all_devs = [d for h in handles for d in h[1]]
        flat = (
            np.asarray(jnp.concatenate(all_devs)) if all_devs else np.zeros(0)
        )
        sampled = []
        off = 0
        for phase, h in zip(self.phases, handles):
            vals, off = phase.sample_finish(h, flat, off)
            sampled.append(vals)
        _t("sample")
        flat = [
            v
            for phase_vals in sampled
            for col in phase_vals
            for v in col
        ]
        channel.mix_felts(flat)
        # 2. quotient alpha
        random_coeff = channel.draw_felt()
        # column handles are ((phase, commit_log), row) pairs into the phases'
        # FFT-order extended stacks — quotient_column_device gathers per
        # stack, so the full committed payload is never re-concatenated
        stacks = {
            (pi_, cl): phase.stacked_ext[cl]
            for pi_, phase in enumerate(self.phases)
            for cl in phase.stacked_ext
        }
        # enumerate (phase, column, point) -> alpha^k
        samples = []
        apow = (1, 0, 0, 0)
        for pi_, (phase, pts, vals) in enumerate(
            zip(self.phases, sample_points, sampled)
        ):
            for col_idx, (zs, vs) in enumerate(zip(pts, vals)):
                cl = phase.commit_logs[col_idx]
                _, pos = phase.group_index[col_idx]
                for z, v in zip(zs, vs):
                    samples.append((cl, ((pi_, cl), pos), z, v, apow))
                    apow = fri.qscalar_mul(apow, random_coeff)
        grouped = quotients.group_samples(samples)
        quotient_cols = [
            (l, quotients.quotient_column_device(l, batches, stacks))
            for l, batches in sorted(grouped.items(), reverse=True)
        ]
        _t("quotients (dispatch)")
        # 3. FRI commit
        fri_prover = fri.FriProver(
            channel, quotient_cols, self.config.fri_config,
            framing=self.config.framing,
        )
        _t("fri commit")
        # 4. PoW
        nonce = channel.grind(self.config.pow_bits)
        channel.mix_u64(nonce)
        _t("pow grind")
        # 5. queries
        max_log = fri_prover.max_log
        queries = channel.draw_queries(self.config.fri_config.n_queries, max_log)
        if self.config.framing == "stwo":
            # 6'. stwo decommit: one mixed-tree opening per phase + one
            # per FRI layer (host-side, see stwo_merkle.py)
            from .stwo_merkle import StwoPhaseOpening

            decommitments = []
            for phase in self.phases:
                qpl = {
                    cl: fri.pair_positions(queries, max_log, cl)
                    for cl in set(phase.commit_logs)
                }
                queried, dec = phase.stwo_tree.decommit(qpl)
                decommitments.append(StwoPhaseOpening(queried, dec))
            fri_roots, fri_openings = fri_prover.stwo_decommit(queries)
            fri_proof = fri.FriProof(
                fri_roots, fri_openings, fri_prover.last_layer
            )
            _t("decommit (stwo framing)")
            return PcsProof(
                [p.roots() for p in self.phases],
                sampled,
                decommitments,
                fri_proof,
                nonce,
            )
        # 6. decommit — all phase trees' AND FRI layer trees' openings in
        # ONE device->host pull
        plan_keys = []
        plans = []
        for pi_, phase in enumerate(self.phases):
            for cl, tree in phase.trees.items():
                pairs = fri.pair_positions(queries, max_log, cl)
                plans.append(merkle.DecommitPlan(tree, pairs))
                plan_keys.append((pi_, cl))
        _t("decommit: phase plans")
        fri_roots, fri_plans = fri_prover.decommit_plans(queries)
        _t("decommit: fri plans")
        decs = merkle.finish_plans(plans + fri_plans)
        _t("decommit: pull + finish")
        decommitments = [{} for _ in self.phases]
        for (pi_, cl), dec in zip(plan_keys, decs[: len(plans)]):
            decommitments[pi_][cl] = dec
        fri_proof = fri.FriProof(
            fri_roots, decs[len(plans) :], fri_prover.last_layer
        )
        _t("decommit (phases + fri)")
        return PcsProof(
            [p.roots() for p in self.phases],
            sampled,
            decommitments,
            fri_proof,
            nonce,
        )


class CommitmentSchemeVerifier:
    def __init__(self, channel, config: PcsConfig = REGULAR_96_BITS):
        self.channel = channel
        self.config = config
        self.phase_roots = []  # [(commit_log, root)] per phase
        self.phase_column_logs = []  # per phase: list of commit logs per column

    def commit(self, roots, column_trace_logs):
        """Replay a phase commitment: mix roots; record column structure."""
        blow = self.config.fri_config.log_blowup_factor
        commit_logs = [l + blow for l in column_trace_logs]
        expected = (
            [max(commit_logs)]
            if self.config.framing == "stwo"
            else sorted(set(commit_logs), reverse=True)
        )
        if [l for l, _ in roots] != expected:
            raise ValueError("PCS: phase roots don't match column sizes")
        for _, r in roots:
            self.channel.mix_root(r)
        self.phase_roots.append(list(roots))
        self.phase_column_logs.append(commit_logs)

    def verify_values(self, sample_points, proof: PcsProof) -> bool:
        channel = self.channel
        sampled = proof.sampled_values
        if len(sampled) != len(self.phase_column_logs):
            return False
        flat = [v for phase_vals in sampled for col in phase_vals for v in col]
        channel.mix_felts(flat)
        random_coeff = channel.draw_felt()
        # build sample records with opened-value handles filled in later
        samples = []
        apow = (1, 0, 0, 0)
        for phase_idx, (logs, pts, vals) in enumerate(
            zip(self.phase_column_logs, sample_points, sampled)
        ):
            if len(pts) != len(logs) or len(vals) != len(logs):
                return False
            for col_idx, (cl, zs, vs) in enumerate(zip(logs, pts, vals)):
                if len(zs) != len(vs):
                    return False
                for z, v in zip(zs, vs):
                    samples.append((cl, (phase_idx, col_idx), z, tuple(v), apow))
                    apow = fri.qscalar_mul(apow, random_coeff)
        grouped = quotients.group_samples(samples)
        column_logs_flat = sorted(grouped, reverse=True)
        fri_verifier = fri.FriVerifier(
            channel, self.config.fri_config, list(grouped.keys()),
            proof.fri_proof, framing=self.config.framing,
        )
        # PoW
        if not channel.verify_pow(proof.pow_nonce, self.config.pow_bits):
            return False
        channel.mix_u64(proof.pow_nonce)
        max_log = max(grouped)
        queries = channel.draw_queries(self.config.fri_config.n_queries, max_log)
        # verify phase decommitments, collect opened values per (phase, col)
        opened = {}  # (phase_idx, col_idx) -> {pos: value}
        if self.config.framing == "stwo":
            from .stwo_merkle import StwoPhaseOpening
            from .stwo_merkle import verify_decommitment as stwo_verify

            for phase_idx, (logs, roots, opening) in enumerate(
                zip(
                    self.phase_column_logs,
                    self.phase_roots,
                    proof.decommitments,
                )
            ):
                if not isinstance(opening, StwoPhaseOpening):
                    return False
                qpl = {
                    cl: fri.pair_positions(queries, max_log, cl)
                    for cl in set(logs)
                }
                if not stwo_verify(
                    roots[0][1], logs, qpl, opening.queried, opening.dec
                ):
                    return False
                for ci, cl in enumerate(logs):
                    opened[(phase_idx, ci)] = dict(
                        zip(qpl[cl], opening.queried[ci])
                    )
        else:
            for phase_idx, (logs, roots, decs) in enumerate(
                zip(
                    self.phase_column_logs,
                    self.phase_roots,
                    proof.decommitments,
                )
            ):
                roots_d = dict(roots)
                for cl in sorted(set(logs), reverse=True):
                    cols_here = [i for i, l in enumerate(logs) if l == cl]
                    pairs = fri.pair_positions(queries, max_log, cl)
                    dec = decs.get(cl) if isinstance(decs, dict) else None
                    if dec is None:
                        return False
                    if not merkle.verify_decommitment(
                        roots_d[cl], cl, len(cols_here), pairs, dec
                    ):
                        return False
                    for j, col_idx in enumerate(cols_here):
                        opened[(phase_idx, col_idx)] = dec.values[j]
        # compute quotient values at pair positions per log size
        col_values = {}
        for l, batches in grouped.items():
            pairs = fri.pair_positions(queries, max_log, l)
            resolved = []
            for b in batches:
                rb = quotients.ColumnSampleBatch(b.z)
                for handle, v, ap in b.entries:
                    vals = opened.get(handle)
                    if vals is None:
                        return False
                    rb.entries.append((vals, v, ap))
                resolved.append(rb)
            col_values[l] = [
                {
                    pos: quotients.quotient_value_host(l, resolved, pos)
                    for pos in pairs
                }
            ]
        return fri_verifier.verify_queries(queries, col_values)
