"""Pallas BLAKE2s leaf kernel vs host hashlib golden path.

Runs in Pallas interpreter mode on the CPU test mesh (CM_PALLAS_INTERPRET);
on a real TPU the same kernel compiles to Mosaic and is used by
prover/stark/merkle.py for Merkle leaf hashing.
"""

import os

os.environ["CM_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax.numpy as jnp
import pytest

from cairo_m_tpu.hash import blake2s_pallas
from cairo_m_tpu.hash.blake2s import hash_words_np


# interpret mode costs ~0.5 s per compression block of 128 lanes, so the
# correctness matrix stays tiny; real-hardware sizes (K=16, n=2^21) are
# exercised + benchmarked on the TPU (numbers in blake2s_pallas.py)
@pytest.mark.parametrize("K,n", [(1, 128), (4, 128), (17, 128)])
def test_pallas_leaf_matches_hashlib(K, n):
    rng = np.random.default_rng(42 + K)
    cols = rng.integers(0, 1 << 32, size=(K, n), dtype=np.uint32)
    got = np.asarray(blake2s_pallas.hash_leaves(jnp.asarray(cols)))
    want = hash_words_np([cols[i] for i in range(K)])  # (n, 8)
    np.testing.assert_array_equal(got.T, want)


def test_pallas_used_by_merkle_on_interpret():
    from cairo_m_tpu.prover.stark import merkle

    rng = np.random.default_rng(7)
    cols = rng.integers(0, (1 << 31) - 1, size=(3, 128), dtype=np.uint32)
    tree = merkle.commit(jnp.asarray(cols))
    # golden: leaf digests with zero-padding to 4 columns
    padded = np.concatenate([cols, np.zeros((1, 128), np.uint32)], axis=0)
    want = hash_words_np([padded[i] for i in range(4)])
    np.testing.assert_array_equal(np.asarray(tree.levels[0]).T, want)
