"""Multi-chip sharding for the prover (SURVEY.md §2.10 mapping).

The reference is single-process (rayon); its parallelism axes map to a
`jax.sharding.Mesh` here:

- SIMD lanes            -> VPU vectorization inside kernels (free)
- rayon row/col loops   -> column/row sharding over the "cols" mesh axis
- component independence-> different column groups on different devices
- LogUp global sums     -> psum over the mesh
- continuation segments -> one segment per host group (DCN; driver-level)

Round-1 scope: **column sharding** of the commit pipeline (each device
LDEs + hashes its share of a phase's columns) and psum-reduced modular
sums (the LogUp-reduction pattern).  Row-sharded circle FFT with ICI
all-to-alls is the round-2 target.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P_

from ..field import m31
from ..hash import blake2s
from ..prover.stark import domain, fft

P = (1 << 31) - 1


def make_mesh(n_devices=None, axis="cols"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def psum_mod(x, axis):
    """Modular psum of uint32 values in [0, P): split into 16-bit halves so
    the integer psum cannot overflow uint32, then recombine mod P."""
    lo = jax.lax.psum(x & jnp.uint32(0xFFFF), axis)
    hi = jax.lax.psum(x >> 16, axis)

    def fold(v):
        v = (v & jnp.uint32(P)) + (v >> 31)
        return jnp.where(v >= P, v - P, v)

    return m31.add(fold(lo), m31.mul(hi, jnp.uint32(1 << 16)))


def sharded_commit_pipeline(mesh, trace_log: int, commit_log: int):
    """Column-sharded LDE + commit-order transform.

    Input: (k, 2^trace_log) fft-order column stack, sharded over the mesh
    axis on dim 0.  Each device transforms its own columns; no collectives
    until the Merkle leaf hash.
    """
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P_(axis, None),
        out_specs=(P_(axis, None), P_(axis, None)),
    )
    def f(stacked):
        coeffs = fft.ifft(stacked, trace_log)
        ext = fft.fft(fft.embed_coeffs(coeffs, trace_log, commit_log), commit_log)
        return coeffs, domain.bit_reverse(ext, commit_log)

    return f


def sharded_logup_total(mesh):
    """Reduce per-device partial LogUp sums (4 QM31 limbs) with psum."""
    axis = mesh.axis_names[0]

    @partial(jax.shard_map, mesh=mesh, in_specs=P_(axis, None), out_specs=P_())
    def f(partials):  # (n_local, 4) uint32 partial sums per device
        total = partials[0]
        for i in range(1, partials.shape[0]):
            total = m31.add(total, partials[i])
        return psum_mod(total, axis)

    return f


def sharded_prove_step(mesh, trace_log: int, commit_log: int):
    """A full sharded prove step for dry runs and scaling benches:
    column-sharded LDE/commit transform, per-device BLAKE2s leaf digests of
    its column share, and a psum'd modular checksum (the LogUp-reduction
    pattern).  Exercises real shardings + collectives end to end."""
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P_(axis, None),
        out_specs=(P_(axis, None), P_()),
    )
    def f(stacked):
        coeffs = fft.ifft(stacked, trace_log)
        ext = fft.fft(fft.embed_coeffs(coeffs, trace_log, commit_log), commit_log)
        commit = domain.bit_reverse(ext, commit_log)
        digests = blake2s.hash_words([commit[i] for i in range(commit.shape[0])])
        check = m31.sum_mod(digests[0] & jnp.uint32(P - 1), axis=0)
        return commit, psum_mod(check, axis)

    return f
