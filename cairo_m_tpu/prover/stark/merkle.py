"""Mixed-degree Merkle commitment over column evaluations (BLAKE2s).

Role-equivalent of stwo's `Blake2sMerkleHasher` vector commitment
(SURVEY.md §2.9): one tree commits many columns of different sizes; a column
of log_size ``l`` is *injected* at depth ``l`` — node ``i`` at depth ``d``
hashes ``left_child || right_child || [col[i] for col in columns at depth d]``
(leaf depth has no children part).  A query position ``pos`` in the largest
domain opens column values at ``pos >> (max_log - l)`` per column.

Commitment runs on device: one batched `hash_words` call per layer
(2^d independent BLAKE2s instances).  Decommitment/verification are host-side
(query paths are tiny and gather-heavy).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ...hash import blake2s


def _group_by_log(columns):
    by_log: dict[int, list] = {}
    for log_size, col in columns:
        by_log.setdefault(int(log_size), []).append(col)
    return by_log


class MerkleTree:
    """Committed tree: per-depth digest arrays (lists of 8 uint32 arrays)."""

    def __init__(self, columns, max_log=None):
        """columns: list of (log_size, uint32 array) in commitment order."""
        self.columns = list(columns)
        by_log = _group_by_log(self.columns)
        self.max_log = max(by_log) if max_log is None else max_log
        self.layers = {}  # depth -> list of 8 arrays, each (2^depth,)
        digests = None
        for d in range(self.max_log, -1, -1):
            msg = []
            if digests is not None:
                # children digests: left words then right words, so the hashed
                # bytes are left_digest || right_digest (matches verifier)
                msg = [w.reshape(-1, 2)[:, 0] for w in digests] + [
                    w.reshape(-1, 2)[:, 1] for w in digests
                ]
            for col in by_log.get(d, []):
                msg.append(col)
            if not msg:
                # empty depth above all columns with no children: hash nothing
                msg = [jnp.zeros((1 << d,), jnp.uint32)]
            digests = blake2s.hash_words(msg)
            self.layers[d] = digests
        self._root_words = [int(np.asarray(w)[0]) for w in digests]

    def root(self) -> bytes:
        return b"".join(int(w).to_bytes(4, "little") for w in self._root_words)


def commit(columns) -> MerkleTree:
    return MerkleTree(columns)


@dataclass
class MerkleDecommitment:
    """sibling hashes (per depth, ordered) + injected column values."""

    # depth -> list of 32-byte digests, in traversal order
    sibling_hashes: dict
    # depth -> list over columns at that depth of {position: value}
    column_values: dict

    def to_json_obj(self):
        return {
            "sibling_hashes": {
                str(d): [h.hex() for h in hs] for d, hs in self.sibling_hashes.items()
            },
            "column_values": {
                str(d): [
                    {str(p): int(v) for p, v in col.items()} for col in cols
                ]
                for d, cols in self.column_values.items()
            },
        }

    @staticmethod
    def from_json_obj(o):
        return MerkleDecommitment(
            {int(d): [bytes.fromhex(h) for h in hs] for d, hs in o["sibling_hashes"].items()},
            {
                int(d): [{int(p): int(v) for p, v in col.items()} for col in cols]
                for d, cols in o["column_values"].items()
            },
        )


def decommit(tree: MerkleTree, positions: list[int]) -> MerkleDecommitment:
    """Open the tree at query positions (indices into the 2^max_log domain)."""
    by_log = _group_by_log(tree.columns)
    # host copies of layer digests
    host_layers = {
        d: np.stack([np.asarray(w) for w in ws], axis=1) for d, ws in tree.layers.items()
    }  # (2^d, 8)
    sibling_hashes: dict[int, list] = {}
    column_values: dict[int, list] = {}
    cur = sorted({p for p in positions})
    for d in range(tree.max_log, 0, -1):
        cols = by_log.get(d, [])
        if cols:
            column_values[d] = [
                {p: int(np.asarray(c[p])) for p in cur} for c in cols
            ]
        sibs = []
        cur_set = set(cur)
        parents = []
        for p in cur:
            sib = p ^ 1
            if sib not in cur_set:
                sibs.append(host_layers[d][sib].astype("<u4").tobytes())
            par = p >> 1
            if not parents or parents[-1] != par:
                parents.append(par)
        sibling_hashes[d] = sibs
        cur = parents
    if 0 in by_log:
        column_values[0] = [{0: int(np.asarray(c[0]))} for c in by_log[0]]
    return MerkleDecommitment(sibling_hashes, column_values)


def verify_decommitment(
    root: bytes,
    max_log: int,
    column_logs: list[int],
    positions: list[int],
    decommitment: MerkleDecommitment,
) -> bool:
    """Recompute the root from opened values + siblings.  column_logs gives
    each committed column's log_size in commitment order."""
    logs_by_depth: dict[int, int] = {}
    for l in column_logs:
        logs_by_depth[l] = logs_by_depth.get(l, 0) + 1
    cur = sorted(set(positions))
    digests: dict[int, bytes] = {}
    for d in range(max_log, 0, -1):
        n_cols = logs_by_depth.get(d, 0)
        vals = decommitment.column_values.get(d, [])
        if n_cols and len(vals) != n_cols:
            return False
        sib_iter = iter(decommitment.sibling_hashes.get(d, []))
        new_digests: dict[int, bytes] = {}
        cur_set = set(cur)
        parents = []
        for p in cur:
            # node digest at depth d for position p
            msg = b""
            if d < max_log:
                l = digests.get(2 * p)
                r = digests.get(2 * p + 1)
                if l is None or r is None:
                    return False
                msg += l + r
            for col in vals:
                if p not in col:
                    return False
                msg += int(col[p]).to_bytes(4, "little")
            if d == max_log and not msg:
                msg = b"\x00" * 4
            node = blake2s.hash_bytes(msg)
            new_digests[p] = node
            sib = p ^ 1
            if sib not in cur_set and sib not in new_digests:
                try:
                    new_digests[sib] = next(sib_iter)
                except StopIteration:
                    return False
            par = p >> 1
            if not parents or parents[-1] != par:
                parents.append(par)
        digests = new_digests
        cur = parents
    # root node (depth 0)
    msg = b""
    if max_log > 0:
        l = digests.get(0)
        r = digests.get(1)
        if l is None or r is None:
            return False
        msg += l + r
    for col in decommitment.column_values.get(0, []):
        msg += int(col[0]).to_bytes(4, "little")
    if max_log == 0 and not msg:
        msg = b"\x00" * 4
    return blake2s.hash_bytes(msg) == root
