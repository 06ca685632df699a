"""Hash layer tests: Poseidon2 host/device agreement + algebraic sanity;
device BLAKE2s bit-exact vs hashlib."""

import numpy as np
import jax
import jax.numpy as jnp

from cairo_m_tpu.field import m31
from cairo_m_tpu.hash import blake2s, poseidon2
from cairo_m_tpu.hash.poseidon2_params import DEFAULT_PARAMS, T

RNG = np.random.default_rng(1)


def test_poseidon2_host_device_agree():
    states = RNG.integers(0, m31.P, size=(64, T), dtype=np.uint32)
    host = poseidon2.permute_np(states)
    dev = jax.jit(poseidon2.permute_jax)(jnp.asarray(states))
    np.testing.assert_array_equal(np.asarray(dev), host)


def test_poseidon2_permutation_is_injective_on_sample():
    states = RNG.integers(0, m31.P, size=(256, T), dtype=np.uint32)
    out = poseidon2.permute_np(states)
    assert len({tuple(r) for r in out}) == 256


def test_poseidon2_hash2_matches_permutation():
    l = np.array([5], dtype=np.uint32)
    r = np.array([42], dtype=np.uint32)
    state = np.zeros((1, T), dtype=np.uint32)
    state[0, 0] = 5
    state[0, 1] = 42
    want = poseidon2.permute_np(state)[0, 0]
    assert poseidon2.hash2_np(l, r)[0] == want
    assert int(np.asarray(jax.jit(poseidon2.hash2_jax)(jnp.asarray(l), jnp.asarray(r)))[0]) == want


def test_default_hashes_chain():
    d = poseidon2.default_hashes()
    assert d[poseidon2.TREE_HEIGHT] == 0
    assert d[poseidon2.TREE_HEIGHT - 1] == poseidon2.hash2_np(
        np.array([0], np.uint32), np.array([0], np.uint32)
    )[0]
    assert len(set(d.tolist())) == len(d)


def test_blake2s_device_matches_hashlib_short():
    # 3-word messages (single block)
    cols = [RNG.integers(0, 2**32, size=16, dtype=np.uint32) for _ in range(3)]
    want = blake2s.hash_words_np(cols)
    got = np.stack(
        [np.asarray(h) for h in jax.jit(blake2s.hash_words)([jnp.asarray(c) for c in cols])],
        axis=1,
    )
    np.testing.assert_array_equal(got, want)


def test_blake2s_device_matches_hashlib_multiblock():
    # 20-word (80-byte) messages: two compression blocks
    cols = [RNG.integers(0, 2**32, size=8, dtype=np.uint32) for _ in range(20)]
    want = blake2s.hash_words_np(cols)
    got = np.stack(
        [np.asarray(h) for h in jax.jit(blake2s.hash_words)([jnp.asarray(c) for c in cols])],
        axis=1,
    )
    np.testing.assert_array_equal(got, want)


def test_blake2s_device_matches_hashlib_exact_block():
    # exactly 16 words = 64 bytes = one full block
    cols = [RNG.integers(0, 2**32, size=4, dtype=np.uint32) for _ in range(16)]
    want = blake2s.hash_words_np(cols)
    got = np.stack(
        [np.asarray(h) for h in jax.jit(blake2s.hash_words)([jnp.asarray(c) for c in cols])],
        axis=1,
    )
    np.testing.assert_array_equal(got, want)


def test_blake2s_device_matches_hashlib_scan_path():
    # 40-word (160-byte) messages: 3 blocks -> lax.scan path
    cols = [RNG.integers(0, 2**32, size=8, dtype=np.uint32) for _ in range(40)]
    want = blake2s.hash_words_np(cols)
    got = np.stack(
        [np.asarray(h) for h in jax.jit(blake2s.hash_words)([jnp.asarray(c) for c in cols])],
        axis=1,
    )
    np.testing.assert_array_equal(got, want)


def test_hash_words_np_vec_matches_hashlib():
    import numpy as np
    from cairo_m_tpu.hash import blake2s

    rng = np.random.default_rng(0)
    for n_words in (2, 8, 16, 17, 33, 48):
        cols = [rng.integers(0, 1 << 32, size=37, dtype=np.uint32)
                for _ in range(n_words)]
        got = np.stack(blake2s.hash_words_np_vec(cols), axis=1)
        want = blake2s.hash_words_np(cols)
        np.testing.assert_array_equal(got, want)
