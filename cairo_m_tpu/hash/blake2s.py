"""BLAKE2s-256 — host (hashlib) and batched device (jnp uint32) paths.

Used for (a) the Fiat-Shamir channel (host-side, tiny and serial — see
`prover/stark/channel.py`) and (b) Merkle commitment trees over trace-column
evaluations (device-side, millions of independent hashes per layer), matching
the role of stwo's `Blake2sMerkleHasher`/`Blake2sChannel` (SURVEY.md §2.9).

The device path implements the full unkeyed BLAKE2s-256 over messages that
are whole uint32 words, which is all the Merkle tree needs (children digests
and M31 column values are 4-byte LE words).  It is bit-identical to
``hashlib.blake2s`` (cross-tested in tests/test_hash.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import jax.numpy as jnp

IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)

SIGMA = np.array(
    [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
        [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
        [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
        [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
        [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
        [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
        [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
        [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
        [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    ],
    dtype=np.int32,
)

# Parameter word 0 for unkeyed BLAKE2s-256: digest_length=32, fanout=1, depth=1
_PARAM0 = np.uint32(0x01010020)


def hash_bytes(data: bytes) -> bytes:
    """Host one-shot BLAKE2s-256."""
    return hashlib.blake2s(data).digest()


def _rotr(x, n: int):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _g(v, a, b, c, d, x, y):
    v[a] = v[a] + v[b] + x
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + y
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress_core(h, m, t_lo, t_hi, last_mask):
    """Shared compression over traced inputs; the 10 rounds run as a
    `lax.scan` over SIGMA so the compiled graph is one round (~70 uint32
    primitives) instead of ten — XLA compile time is superlinear in graph
    size, and Merkle commitment jits one hash kernel per level shape."""
    import jax

    v = list(h) + [jnp.uint32(iv) * jnp.ones_like(h[0]) for iv in IV]
    v[12] = v[12] ^ t_lo
    v[13] = v[13] ^ t_hi
    v[14] = v[14] ^ last_mask
    mstack = jnp.stack(list(m))  # (16, ...)

    def round_body(vc, s):
        w = list(vc)
        mr = jnp.take(mstack, s, axis=0)
        _g(w, 0, 4, 8, 12, mr[0], mr[1])
        _g(w, 1, 5, 9, 13, mr[2], mr[3])
        _g(w, 2, 6, 10, 14, mr[4], mr[5])
        _g(w, 3, 7, 11, 15, mr[6], mr[7])
        _g(w, 0, 5, 10, 15, mr[8], mr[9])
        _g(w, 1, 6, 11, 12, mr[10], mr[11])
        _g(w, 2, 7, 8, 13, mr[12], mr[13])
        _g(w, 3, 4, 9, 14, mr[14], mr[15])
        return tuple(w), None

    vf, _ = jax.lax.scan(round_body, tuple(v), jnp.asarray(SIGMA))
    return [h[i] ^ vf[i] ^ vf[i + 8] for i in range(8)]


def compress(h, m, t: int, last: bool):
    """One BLAKE2s compression.  ``h``: list of 8 uint32 arrays; ``m``: list of
    16 uint32 arrays (the message block); ``t``: byte offset counter (static);
    ``last``: final-block flag (static)."""
    return _compress_core(
        h, m,
        jnp.uint32(t & 0xFFFFFFFF),
        jnp.uint32((t >> 32) & 0xFFFFFFFF),
        jnp.uint32(0xFFFFFFFF if last else 0),
    )


def hash_words(cols):
    """Batched BLAKE2s-256 of word-aligned messages.

    ``cols``: list of equal-shape uint32 arrays — element ``i`` of each array
    forms message ``i`` (little-endian words).  Returns a list of 8 uint32
    arrays (the digests as LE words).  Message byte length = 4*len(cols),
    static at trace time.

    Long messages run the compression as a `lax.scan` over blocks so the
    compiled graph stays one-compress-sized regardless of message length.
    """
    import jax

    n_words = len(cols)
    n_bytes = n_words * 4
    assert n_words >= 1
    shape_like = cols[0]
    h = [jnp.uint32(int(IV[i]) ^ (int(_PARAM0) if i == 0 else 0)) * jnp.ones_like(shape_like) for i in range(8)]
    zero = jnp.zeros_like(shape_like)
    n_blocks = max(1, -(-n_words // 16))
    if n_blocks <= 2:
        for blk in range(n_blocks):
            block = cols[blk * 16 : (blk + 1) * 16]
            block = list(block) + [zero] * (16 - len(block))
            is_last = blk == n_blocks - 1
            t = n_bytes if is_last else (blk + 1) * 64
            h = compress(h, block, t, is_last)
        return h
    # scan formulation: blocks (n_blocks, 16, ...), per-block t and last flag
    padded = list(cols) + [zero] * (n_blocks * 16 - n_words)
    blocks = jnp.stack(
        [jnp.stack(padded[b * 16 : (b + 1) * 16]) for b in range(n_blocks)]
    )
    ts = jnp.asarray(
        np.array(
            [n_bytes if b == n_blocks - 1 else (b + 1) * 64 for b in range(n_blocks)],
            dtype=np.uint64,
        ).astype(np.uint32)
    )
    lasts = jnp.asarray(
        np.array([b == n_blocks - 1 for b in range(n_blocks)], dtype=np.uint32)
    )

    def body(hcarry, xs):
        block, t, last = xs
        hn = compress_dyn(list(hcarry), [block[i] for i in range(16)], t, last)
        return tuple(hn), None

    hfinal, _ = jax.lax.scan(body, tuple(h), (blocks, ts, lasts))
    return list(hfinal)


def compress_dyn(h, m, t, last):
    """Compression with traced t (uint32, < 2^32) and last flag (uint32 0/1)."""
    return _compress_core(h, m, t, jnp.uint32(0), last * jnp.uint32(0xFFFFFFFF))


def hash_words_np(cols) -> np.ndarray:
    """Host golden path for hash_words (loops over hashlib)."""
    cols = [np.asarray(c, dtype=np.uint32) for c in cols]
    n = cols[0].shape[0] if cols[0].ndim else 1
    out = np.zeros((n, 8), dtype=np.uint32)
    stacked = np.stack([c.reshape(-1) for c in cols], axis=1)  # (n, n_words)
    for i in range(n):
        d = hashlib.blake2s(stacked[i].astype("<u4").tobytes()).digest()
        out[i] = np.frombuffer(d, dtype="<u4")
    return out


# ---------------------------------------------------------------------------
# Vectorized NumPy path — same algorithm as hash_words, plain uint32 arrays.
# Used by the host Merkle-pyramid tails (prover/stark/merkle.py), where a
# device dispatch costs more tunnel latency than hashing 2^16 nodes on host.
# ---------------------------------------------------------------------------


def _g_np(v, a, b, c, d, x, y):
    u32 = np.uint32
    v[a] = (v[a] + v[b] + x).astype(u32)
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = (v[c] + v[d]).astype(u32)
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = (v[a] + v[b] + y).astype(u32)
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = (v[c] + v[d]).astype(u32)
    v[b] = _rotr(v[b] ^ v[c], 7)


def _compress_np(h, m, t: int, last: bool):
    u32 = np.uint32
    v = list(h) + [np.full_like(h[0], iv) for iv in IV]
    v[12] = v[12] ^ u32(t & 0xFFFFFFFF)
    v[13] = v[13] ^ u32((t >> 32) & 0xFFFFFFFF)
    if last:
        v[14] = v[14] ^ u32(0xFFFFFFFF)
    for s in SIGMA:
        _g_np(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
        _g_np(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
        _g_np(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
        _g_np(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
        _g_np(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
        _g_np(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
        _g_np(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
        _g_np(v, 3, 4, 9, 14, m[s[14]], m[s[15]])
    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


def hash_words_np_vec(cols) -> list:
    """NumPy twin of `hash_words`: list of equal-shape uint32 arrays ->
    list of 8 digest-word arrays.  Cross-checked in tests/test_hash.py."""
    with np.errstate(over="ignore"):
        cols = [np.asarray(c, dtype=np.uint32) for c in cols]
        n_words = len(cols)
        n_bytes = n_words * 4
        shape_like = cols[0]
        h = [
            np.full_like(
                shape_like, IV[i] ^ (_PARAM0 if i == 0 else 0), dtype=np.uint32
            )
            for i in range(8)
        ]
        zero = np.zeros_like(shape_like)
        n_blocks = max(1, -(-n_words // 16))
        for blk in range(n_blocks):
            block = cols[blk * 16 : (blk + 1) * 16]
            block = list(block) + [zero] * (16 - len(block))
            is_last = blk == n_blocks - 1
            t = n_bytes if is_last else (blk + 1) * 64
            h = _compress_np(h, block, t, is_last)
        return h
