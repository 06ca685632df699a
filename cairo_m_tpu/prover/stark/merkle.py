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
_hash_leaf = jax.jit(
    lambda stacked: jnp.stack(blake2s.hash_words(list(stacked)))
)


@jax.jit
def _hash_inner(digests):
    msg = [digests[w].reshape(-1, 2)[:, 0] for w in range(8)] + [
        digests[w].reshape(-1, 2)[:, 1] for w in range(8)
    ]
    return jnp.stack(blake2s.hash_words(msg))


class MerkleTree:
    """One tree over equal-length uint32 columns (length 2^log_size)."""

    def __init__(self, columns):
        """columns: list of 1-D arrays, or one stacked (n_cols, n) array."""
        if isinstance(columns, (list, tuple)):
            stacked = jnp.stack(list(columns))
        else:
            stacked = columns
        n_cols, n = int(stacked.shape[0]), int(stacked.shape[1])
        self.columns = stacked
        self.log_size = n.bit_length() - 1
        assert 1 << self.log_size == n
        digests = _hash_leaf(stacked)
        self.levels = [digests]  # (8, m) per level
        while int(digests.shape[1]) > 1:
            digests = _hash_inner(digests)
            self.levels.append(digests)
        self._root = np.asarray(self.levels[-1][:, 0]).astype("<u4").tobytes()

    def root(self) -> bytes:
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


def decommit(tree: MerkleTree, positions) -> MerkleDecommitment:
    """Open sorted positions.  Only the opened values and the needed sibling
    digests move device->host (gathers) — never whole columns or levels."""
    positions = sorted(set(int(p) for p in positions))
    pos_arr = jnp.asarray(np.array(positions, np.int32))
    opened = np.asarray(jnp.take(tree.columns, pos_arr, axis=1))  # (K, P)
    values = [
        {p: int(opened[ci, j]) for j, p in enumerate(positions)}
        for ci in range(opened.shape[0])
    ]
    siblings = []
    cur = positions
    for lvl in range(len(tree.levels) - 1):
        cur_set = set(cur)
        sibs = [p ^ 1 for p in cur if (p ^ 1) not in cur_set]
        parents = []
        for p in cur:
            par = p >> 1
            if not parents or parents[-1] != par:
                parents.append(par)
        if sibs:
            sib_arr = jnp.asarray(np.array(sibs, np.int32))
            words = np.asarray(
                jnp.take(tree.levels[lvl], sib_arr, axis=1)
            )  # (8, S)
            for j in range(words.shape[1]):
                siblings.append(words[:, j].astype("<u4").tobytes())
        cur = parents
    return MerkleDecommitment(values, siblings)


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
    # recompute leaf digests
    digests = {}
    for p in positions:
        msg = b""
        for col in dec.values:
            if p not in col:
                return False
            msg += int(col[p]).to_bytes(4, "little")
        digests[p] = blake2s.hash_bytes(msg)
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
