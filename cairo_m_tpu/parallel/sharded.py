"""Mesh sharding of the real prover (SURVEY.md §2.10 mapping, VERDICT r2 #2).

Design: the prover's big arrays are column *stacks* of shape (K, 2^log) with
the evaluation-domain axis trailing.  Under an active mesh, every upload
point in `prove_cairo_m` places stacks with a `NamedSharding` that shards
the DOMAIN axis (rows of the trace) across devices, and every jitted kernel
downstream compiles under GSPMD, which inserts the collectives:

- circle-FFT butterflies: the first log2(D) levels pair elements across
  shards -> XLA lowers the level reshapes to collective-permute halo
  exchanges over ICI; deeper levels are shard-local;
- Merkle levels: adjacent-pair reduction is shard-local until the pyramid
  is narrower than the mesh, then resolves to a gather of D digests;
- wide-tape bank gathers (fft-order -> row-order permutation): all-to-all;
- LogUp claimed sums / multiplicity reductions: `m31.sum_mod`'s pairwise
  tree lowers to psum-style cross-shard reductions.

This follows the scaling-book recipe (mesh + sharding annotations + XLA
GSPMD) rather than hand-written per-kernel collectives; the explicit
`shard_map` building blocks (psum_mod, column-sharded commit) live in
`parallel/mesh.py` and are cross-checked against this path in tests.

Proofs are bit-identical to single-device runs: every kernel is exact
uint32 modular arithmetic with deterministic reduction trees, so sharding
changes the schedule, never the values (asserted by
tests/test_sharded_prover.py and `__graft_entry__.dryrun_multichip`).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P_

AXIS = "rows"

_ACTIVE: list = []


def make_row_mesh(n_devices=None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


@contextmanager
def prover_mesh(mesh: Mesh):
    """Run `prove_cairo_m` (and friends) with domain-axis sharding."""
    _ACTIVE.append(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE.pop()


def active_mesh():
    return _ACTIVE[-1] if _ACTIVE else None


def maybe_shard(x):
    """Place a device array with the trailing (domain) axis sharded over
    the active mesh; no-op when no mesh is active or the axis doesn't
    divide evenly (tiny tables stay replicated)."""
    mesh = active_mesh()
    if mesh is None or not hasattr(x, "ndim") or x.ndim == 0:
        return x
    d = mesh.devices.size
    if int(x.shape[-1]) % d:
        return x
    spec = P_(*([None] * (x.ndim - 1) + [AXIS]))
    return jax.device_put(x, NamedSharding(mesh, spec))
