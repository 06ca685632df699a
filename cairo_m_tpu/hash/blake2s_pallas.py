"""Pallas TPU kernel for batched BLAKE2s-256 Merkle leaf hashing.

The Merkle commit's leaf pass is the prover's hottest hash workload: every
committed column group hashes K words x 2^logsize leaves (SURVEY.md §2.9,
stwo `Blake2sMerkleHasher`).  The jnp path (hash/blake2s.py) lowers to XLA
ops with HBM round-trips between fusions; this kernel keeps one (K, TILE)
block of column words in VMEM and runs the whole multi-block compression
on-chip, one grid step per leaf tile.

Roofline: BLAKE2s compression is ~640 VPU uint32 ops per 64-byte block;
a (K, n) leaf pass does ceil(K/16) blocks over n lanes, so arithmetic
intensity is ~10 ops per HBM byte (4K read + 32 written per leaf) — the
kernel is compute-bound and VMEM residency of the 16-word v-state sets the
ceiling.  Measured on one v5e chip (5-run average, vs the jitted jnp path):

    K=16 n=2^21:  8.1 ms vs 42.5 ms  (5.2x)   0.26 Gcompress/s
    K=8  n=2^22:  6.8 ms vs 83.7 ms  (12.3x)  0.62 Gcompress/s
    K=32 n=2^20:  5.7 ms vs 22.9 ms  (4.0x)   0.37 Gcompress/s

(cross-check + harness: tests/test_pallas.py and /tmp job logs).

Used by prover/stark/merkle.py on TPU backends; the jnp path remains the
fallback (CPU tests, tiny trees) and the golden reference.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blake2s import IV, SIGMA, _PARAM0

_INTERPRET = bool(os.environ.get("CM_PALLAS_INTERPRET"))

# Pallas handles leaf hashing for moderate column counts; wider stacks
# (poseidon2's 443-column group) live on small domains where the jnp path
# is fine and the unrolled kernel would bloat compile time.
MAX_COLS = 64
MIN_LANES = 1024


def _rotr(x, n: int):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def _g(v, a, b, c, d, x, y):
    v[a] = v[a] + v[b] + x
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + y
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress(h, m, t: int, last: bool, T: int):
    """One unrolled BLAKE2s compression over (1, T) uint32 lanes."""
    v = list(h) + [jnp.full((1, T), np.uint32(iv), jnp.uint32) for iv in IV]
    v[12] = v[12] ^ jnp.uint32(t & 0xFFFFFFFF)
    # t < 2^32 for any realistic K; t_hi stays 0
    if last:
        v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)
    for r in range(10):
        s = SIGMA[r]
        _g(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
        _g(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
        _g(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
        _g(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
        _g(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
        _g(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
        _g(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
        _g(v, 3, 4, 9, 14, m[s[14]], m[s[15]])
    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


def _leaf_kernel(K: int, T: int):
    n_blocks = max(1, -(-K // 16))
    n_bytes = K * 4

    def kernel(in_ref, out_ref):
        h = [
            jnp.full(
                (1, T),
                np.uint32(int(IV[i]) ^ (int(_PARAM0) if i == 0 else 0)),
                jnp.uint32,
            )
            for i in range(8)
        ]
        zero = jnp.zeros((1, T), jnp.uint32)
        for blk in range(n_blocks):
            m = [
                in_ref[blk * 16 + w, :][None, :]
                if blk * 16 + w < K
                else zero
                for w in range(16)
            ]
            is_last = blk == n_blocks - 1
            t = n_bytes if is_last else (blk + 1) * 64
            h = _compress(h, m, t, is_last, T)
        for i in range(8):
            out_ref[i, :] = h[i][0]

    return kernel


@lru_cache(maxsize=None)
def _leaf_call(K: int, n: int, tile: int):
    grid = n // tile
    return pl.pallas_call(
        _leaf_kernel(K, tile),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.uint32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (K, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (8, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=_INTERPRET,
    )


def _pick_tile(K: int, n: int) -> int:
    """Largest power-of-two tile with the input block under ~2 MiB VMEM."""
    tile = 1 << 13
    while tile > 512 and K * tile * 4 > (2 << 20):
        tile >>= 1
    return min(tile, n)


def supported(K: int, n: int) -> bool:
    if _INTERPRET:
        return K <= MAX_COLS and n >= 128
    return (
        jax.default_backend() not in ("cpu",)
        and K <= MAX_COLS
        and n >= MIN_LANES
    )


def hash_leaves(stacked) -> jnp.ndarray:
    """(K, n) uint32 column stack -> (8, n) LE digest words; bit-identical
    to blake2s.hash_words (cross-checked in tests/test_pallas.py)."""
    K, n = int(stacked.shape[0]), int(stacked.shape[1])
    tile = _pick_tile(K, n)
    return _leaf_call(K, n, tile)(stacked)
