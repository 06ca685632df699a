"""Merkle vector commitment over same-size column groups (BLAKE2s).

Design (deviation from stwo's single mixed-degree tree, documented):
every tree commits a group of equal-length columns — leaf ``i`` hashes the
concatenation of all columns' values at ``i``; internal nodes hash their two
children.  A commitment *phase* (preprocessed / trace / interaction /
composition / FRI layer) holds one tree per log_size, whose roots are mixed
into the channel in a fixed order.  This keeps FRI pair openings
``{p, p^1}`` cheap (adjacent leaves share their whole path) and the verifier
uniform, at the cost of a handful of extra 32-byte roots per proof.

Columns are stored in **commit order** = bit-reversed FFT order, so FRI
folding pairs are adjacent leaves (see `fri.py`).

Commitment runs on device (one batched BLAKE2s call per level); decommitment
and verification are host-side path walks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ...hash import blake2s


# One jitted hash per level: shapes (n_words, n) repeat across levels and
# trees, so the jit cache amortizes; a whole-pyramid jit would be a single
# huge graph with superlinear XLA compile time.  Levels are kept as stacked
# (8, m) digest arrays so openings are single device gathers.
#
# Protocol convention: leaf messages pad the column count to the next power
# of two with zero words (verify_decommitment pads identically), so the
# leaf-hash kernel shape buckets instead of compiling per column count.
_hash_leaf = jax.jit(
    lambda stacked: jnp.stack(blake2s.hash_words(list(stacked)))
)


def _pad_cols(k: int) -> int:
    return 1 << max(0, (k - 1).bit_length())


@jax.jit
def _hash_inner(digests):
    msg = [digests[w].reshape(-1, 2)[:, 0] for w in range(8)] + [
        digests[w].reshape(-1, 2)[:, 1] for w in range(8)
    ]
    return jnp.stack(blake2s.hash_words(msg))


@jax.jit
def _inner_msg(digests):
    """(8, m) level -> (16, m/2) inner-node messages: words 0-7 = left
    (even-lane) digests, 8-15 = right (odd) — the layout `_hash_inner`
    hashes.  Produced by XLA strided slices so the hash itself can run in
    the Pallas leaf kernel (a 16-word message IS a leaf message: one
    64-byte block, identical framing)."""
    m = digests.reshape(8, -1, 2)
    return jnp.concatenate([m[:, :, 0], m[:, :, 1]], axis=0)


def _hash_inner_fast(digests):
    """One inner level; Pallas-accelerated when supported (the jnp
    `_hash_inner` path measured 4-12x slower — it was the dominant commit
    cost once leaves moved to Pallas)."""
    from ...hash import blake2s_pallas

    half = int(digests.shape[1]) // 2
    if blake2s_pallas.supported(16, half):
        return blake2s_pallas.hash_leaves(_inner_msg(digests))
    return _hash_inner(digests)


# Pyramid levels at or below this node count finish on the HOST: each inner
# level is one device dispatch + (for the root) one device->host pull, and at
# small sizes dispatch latency over the accelerator tunnel dwarfs the hash
# work.  One (8, 2^_HOST_TOP_LOG) pull (~32 KB) replaces _HOST_TOP_LOG
# dispatches per tree — a large win for the ~20 serial FRI layer trees whose
# roots feed the Fiat-Shamir channel one by one.
_HOST_TOP_LOG = 10


def _host_inner_levels(digests_np: np.ndarray):
    """digests_np: (m, 8) level -> list of all upper levels [(m/2, 8), ...]
    via the vectorized NumPy BLAKE2s (blake2s.hash_words_np_vec)."""
    levels = []
    cur = digests_np
    while cur.shape[0] > 1:
        pairs = cur.reshape(-1, 16)  # (m/2, 16): left digest words, right
        nxt = np.stack(
            blake2s.hash_words_np_vec([pairs[:, w] for w in range(16)]),
            axis=1,
        )
        levels.append(nxt.astype(np.uint32))
        cur = nxt
    return levels


class MerkleTree:
    """One tree over equal-length uint32 columns (length 2^log_size).

    Hybrid pyramid: leaf digests + large inner levels on device (one batched
    BLAKE2s per level, `levels`, (8, m) each); the first level of
    <= 2^_HOST_TOP_LOG nodes is pulled once and the pyramid finishes on
    host (`host_chain`: (m, 8) np arrays for levels D-1..root, where D =
    len(levels); host_chain[0] is the pulled copy of the last device
    level).  NumPy input builds entirely on host, levels == [] and
    host_chain covers every level (used by the FRI tail layers)."""

    def __init__(self, columns, defer_top: bool = False):
        """columns: list of 1-D arrays, or one stacked (n_cols, n) array.

        ``defer_top=True``: don't pull the top device level yet — the
        caller batches many trees' tops into ONE device->host transfer and
        calls `finish_host` on each (a sync round trip costs 27-80 ms over
        the accelerator tunnel; a phase builds up to ~9 trees)."""
        host_input = isinstance(columns, np.ndarray) or (
            isinstance(columns, (list, tuple))
            and columns
            and isinstance(columns[0], np.ndarray)
        )
        if isinstance(columns, (list, tuple)):
            stacked = (
                np.stack(list(columns)) if host_input else jnp.stack(list(columns))
            )
        else:
            stacked = columns
        n_cols, n = int(stacked.shape[0]), int(stacked.shape[1])
        self.columns = stacked
        self.log_size = n.bit_length() - 1
        assert 1 << self.log_size == n
        kp = _pad_cols(n_cols)
        self.levels = []  # device levels, (8, m) each, largest first
        if host_input:
            from ...hash import blake2s

            hashed = stacked
            if kp != n_cols:
                hashed = np.concatenate(
                    [stacked, np.zeros((kp - n_cols, n), np.uint32)], axis=0
                )
            leaf = np.stack(
                blake2s.hash_words_np_vec(list(hashed)), axis=1
            )  # (n, 8)
            self.host_chain = [leaf] + _host_inner_levels(leaf)
            self.root_dev = None
            self._root = self.host_chain[-1][0].astype("<u4").tobytes()
            return
        hashed = (
            stacked
            if kp == n_cols
            else jnp.concatenate(
                [stacked, jnp.zeros((kp - n_cols, n), jnp.uint32)], axis=0
            )
        )
        from ...hash import blake2s_pallas

        if blake2s_pallas.supported(kp, n):
            digests = blake2s_pallas.hash_leaves(hashed)
        else:
            digests = _hash_leaf(hashed)
        self.levels = [digests]  # (8, m) per level
        while int(digests.shape[1]) > (1 << _HOST_TOP_LOG):
            digests = _hash_inner_fast(digests)
            self.levels.append(digests)
        self.top_dev = digests  # (8, m), m <= 2^_HOST_TOP_LOG
        self.root_dev = None
        if defer_top:
            self.host_chain = None  # caller batch-pulls and finish_host()es
            self._root = None
        else:
            self.finish_host(np.asarray(digests))

    def finish_host(self, top_words: np.ndarray):
        """Complete the pyramid on host from the pulled (8, m) top level."""
        top = np.asarray(top_words).T.copy()  # (m, 8)
        # host chain: level D-1 (the pulled copy) and all its ancestors
        self.host_chain = [top] + _host_inner_levels(top)
        self._root = self.host_chain[-1][0].astype("<u4").tobytes()

    def root(self) -> bytes:
        return self._root

    def set_root_words(self, words8):
        self._root = np.asarray(words8).astype("<u4").tobytes()
        return self._root


def commit(columns) -> MerkleTree:
    return MerkleTree(columns)


@dataclass
class MerkleDecommitment:
    """Opened values + authentication paths for a sorted position set."""

    values: list  # per column: {position: value}
    siblings: list  # list of 32-byte digests in consumption order

    def to_json_obj(self):
        return {
            "values": [{str(p): int(v) for p, v in col.items()} for col in self.values],
            "siblings": [h.hex() for h in self.siblings],
        }

    @staticmethod
    def from_json_obj(o):
        return MerkleDecommitment(
            [{int(p): int(v) for p, v in col.items()} for col in o["values"]],
            [bytes.fromhex(h) for h in o["siblings"]],
        )


class DecommitPlan:
    """Device gathers + metadata for opening one tree; `finish` assembles
    the decommitment from the host copy of `flat`.  Callers concatenate many
    plans' `flat` arrays and pull them in ONE device->host transfer.

    Siblings from the tree's host-resident upper levels are collected
    directly (no device traffic) and appended after the device-level
    siblings — the same order the verifier consumes them in."""

    def __init__(self, tree: MerkleTree, positions):
        self.positions = sorted(set(int(p) for p in positions))
        self.n_cols = int(tree.columns.shape[0])
        host_tree = not tree.levels
        # CRITICAL for warm throughput: every device gather below is padded
        # to a power-of-two count (repeating the last index — harmless
        # duplicates are sliced off in finish()).  The opened positions are
        # query-derived, so their raw counts differ on EVERY proof; unpadded
        # gathers made each prove recompile its eager take/concat
        # executables, which dominated decommit (~4-10 s per 1M-cycle
        # segment vs 0.3 s warm).
        def _pad_pow2(idx: list) -> np.ndarray:
            k = max(1, len(idx))
            kp = 1 << (k - 1).bit_length()
            return np.asarray(idx + [idx[-1]] * (kp - k), np.int32)

        pos_np = np.array(self.positions, np.int32)
        if host_tree:
            parts_np = [np.take(tree.columns, pos_np, axis=1).reshape(-1)]
        else:
            pos_pad = _pad_pow2(list(self.positions))
            self._pos_pad = int(pos_pad.shape[0])
            parts = [
                jnp.take(
                    tree.columns, jnp.asarray(pos_pad), axis=1
                ).reshape(-1)
            ]
        # one gather over the packed device pyramid instead of one per level
        # (tunnel dispatch latency makes per-level takes the decommit cost).
        # `packed` stays local: every tree is decommitted exactly once per
        # proof, so caching it on the tree only extends device-memory
        # lifetime without reuse.
        n_dev = len(tree.levels)
        packed = None
        if n_dev > 1:
            packed = jnp.concatenate(tree.levels[:-1], axis=1)
        # host_chain[0] corresponds to pyramid level max(n_dev - 1, 0)
        chain_base = max(n_dev - 1, 0)
        n_levels = chain_base + len(tree.host_chain)
        level_off = 0
        sib_idx = []
        self.sib_counts = []
        self.host_siblings = []  # 32-byte digests, level order
        cur = self.positions
        for lvl in range(n_levels - 1):
            cur_set = set(cur)
            sibs = [p ^ 1 for p in cur if (p ^ 1) not in cur_set]
            parents = []
            for p in cur:
                par = p >> 1
                if not parents or parents[-1] != par:
                    parents.append(par)
            if lvl < n_dev - 1:
                # device level (gathered from `packed`)
                self.sib_counts.append(len(sibs))
                sib_idx += [level_off + s for s in sibs]
                level_off += int(tree.levels[lvl].shape[1])
            else:
                hl = tree.host_chain[lvl - chain_base]
                for s in sibs:
                    self.host_siblings.append(hl[s].astype("<u4").tobytes())
            cur = parents
        if not host_tree:
            self._sib_pad = 0
            if sib_idx:
                sib_pad = _pad_pow2(sib_idx)
                self._sib_pad = int(sib_pad.shape[0])
                parts.append(
                    jnp.take(
                        packed, jnp.asarray(sib_pad), axis=1
                    ).T.reshape(-1)  # (S_pad, 8) word-major per digest
                )
            self.flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            self.host_flat = None
        else:
            self.flat = None
            self.host_flat = parts_np[0]
        self.size = int(
            (self.host_flat if self.flat is None else self.flat).shape[0]
        )

    def finish(self, host_flat: np.ndarray) -> MerkleDecommitment:
        P_ = len(self.positions)
        P_pad = P_ if self.host_flat is not None else self._pos_pad
        opened = host_flat[: self.n_cols * P_pad].reshape(self.n_cols, P_pad)
        values = [
            {p: int(opened[ci, j]) for j, p in enumerate(self.positions)}
            for ci in range(self.n_cols)
        ]
        off = self.n_cols * P_pad
        siblings = []
        for s in self.sib_counts:
            words = host_flat[off : off + 8 * s].reshape(s, 8)
            off += 8 * s
            for j in range(s):
                siblings.append(words[j].astype("<u4").tobytes())
        siblings += self.host_siblings
        return MerkleDecommitment(values, siblings)


def finish_plans(plans: list) -> list:
    """Pull every plan's device gathers in one transfer; host-only plans
    finish without device traffic."""
    if not plans:
        return []
    dev_plans = [p for p in plans if p.flat is not None]
    host = (
        np.asarray(jnp.concatenate([p.flat for p in dev_plans]))
        if dev_plans
        else None
    )
    out = []
    off = 0
    for p in plans:
        if p.flat is None:
            out.append(p.finish(p.host_flat))
        else:
            out.append(p.finish(host[off : off + p.size]))
            off += p.size
    return out


def decommit(tree: MerkleTree, positions) -> MerkleDecommitment:
    """Open sorted positions (single-tree convenience: one device pull)."""
    plan = DecommitPlan(tree, positions)
    return plan.finish(np.asarray(plan.flat))


def verify_decommitment(
    root: bytes,
    log_size: int,
    n_columns: int,
    positions,
    dec: MerkleDecommitment,
) -> bool:
    positions = sorted(set(int(p) for p in positions))
    if len(dec.values) != n_columns:
        return False
    # recompute leaf digests (column count padded to a power of two with
    # zero words — the committer's leaf-message convention)
    pad = (_pad_cols(n_columns) - n_columns) * b"\x00\x00\x00\x00"
    digests = {}
    for p in positions:
        msg = b""
        for col in dec.values:
            if p not in col:
                return False
            msg += int(col[p]).to_bytes(4, "little")
        digests[p] = blake2s.hash_bytes(msg + pad)
    sib_iter = iter(dec.siblings)
    cur = positions
    for _ in range(log_size):
        parents = []
        parent_digests = {}
        for p in cur:
            sib = p ^ 1
            if sib not in digests:
                try:
                    digests[sib] = next(sib_iter)
                except StopIteration:
                    return False
            l, r = (
                (digests[p], digests[sib]) if p % 2 == 0 else (digests[sib], digests[p])
            )
            par = p >> 1
            if par not in parent_digests:
                parent_digests[par] = blake2s.hash_bytes(l + r)
                parents.append(par)
        digests = parent_digests
        cur = parents
    if next(sib_iter, None) is not None:
        return False
    return digests.get(0) == root
