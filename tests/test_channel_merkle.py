"""Fiat-Shamir channel + Merkle vector-commitment tests."""

import numpy as np
import jax.numpy as jnp

from cairo_m_tpu.prover.stark import merkle
from cairo_m_tpu.prover.stark.channel import Blake2sChannel

RNG = np.random.default_rng(9)
P = (1 << 31) - 1


def test_channel_determinism_and_divergence():
    a, b = Blake2sChannel(), Blake2sChannel()
    a.mix_u64(7)
    b.mix_u64(7)
    assert a.draw_felt() == b.draw_felt()
    assert a.draw_felt() == b.draw_felt()  # same sequence
    b.mix_u64(8)
    assert a.draw_felt() != b.draw_felt()
    c = Blake2sChannel()
    assert c.draw_felt() != c.draw_felt()
    d = Blake2sChannel()
    d.mix_u64(7)
    d.draw_felt()
    d.mix_u64(9)
    e = Blake2sChannel()
    e.mix_u64(7)
    e.mix_u64(9)
    assert d.digest == e.digest and d.draw_felt() == e.draw_felt()


def test_channel_felts_in_range():
    ch = Blake2sChannel()
    ch.mix_u32s([1, 2, 3])
    for q in ch.draw_felts(100):
        assert all(0 <= l < P for l in q)


def test_pow_grind_and_verify():
    ch = Blake2sChannel()
    ch.mix_u64(1234)
    nonce = ch.grind(8)
    assert ch.verify_pow(nonce, 8)


def test_queries_distinct_sorted():
    ch = Blake2sChannel()
    ch.mix_u64(5)
    qs = ch.draw_queries(80, 12)
    assert len(qs) == 80 == len(set(qs))
    assert qs == sorted(qs)
    assert all(0 <= q < 4096 for q in qs)


def _mk_tree(n_cols=3, log=6):
    cols = [
        jnp.asarray(RNG.integers(0, P, size=1 << log, dtype=np.uint32))
        for _ in range(n_cols)
    ]
    return cols, merkle.commit(cols)


def test_merkle_commit_verify_roundtrip():
    cols, tree = _mk_tree()
    root = tree.root()
    positions = [0, 5, 17, 63, 62, 16]
    dec = merkle.decommit(tree, positions)
    assert merkle.verify_decommitment(root, 6, 3, positions, dec)
    for c, got in zip(cols, dec.values):
        for p, v in got.items():
            assert v == int(np.asarray(c[p]))
    dec2 = merkle.MerkleDecommitment.from_json_obj(dec.to_json_obj())
    assert merkle.verify_decommitment(root, 6, 3, positions, dec2)


def test_merkle_rejects_tampering():
    cols, tree = _mk_tree()
    root = tree.root()
    positions = [3, 40]
    dec = merkle.decommit(tree, positions)
    bad = merkle.MerkleDecommitment.from_json_obj(dec.to_json_obj())
    k = next(iter(bad.values[0]))
    bad.values[0][k] = (bad.values[0][k] + 1) % P
    assert not merkle.verify_decommitment(root, 6, 3, positions, bad)
    bad2 = merkle.MerkleDecommitment.from_json_obj(dec.to_json_obj())
    bad2.siblings[0] = bytes([bad2.siblings[0][0] ^ 1]) + bad2.siblings[0][1:]
    assert not merkle.verify_decommitment(root, 6, 3, positions, bad2)
    assert not merkle.verify_decommitment(b"\x00" * 32, 6, 3, positions, dec)
    # truncated siblings
    bad3 = merkle.MerkleDecommitment.from_json_obj(dec.to_json_obj())
    bad3.siblings = bad3.siblings[:-1]
    assert not merkle.verify_decommitment(root, 6, 3, positions, bad3)


def test_merkle_pair_positions_cheap():
    cols, tree = _mk_tree()
    dec_pair = merkle.decommit(tree, [6, 7])
    dec_single = merkle.decommit(tree, [6])
    # adjacent pair costs one fewer sibling than a lone position
    assert len(dec_pair.siblings) == len(dec_single.siblings) - 1
    assert merkle.verify_decommitment(tree.root(), 6, 3, [6, 7], dec_pair)


def test_merkle_single_column_log0():
    col = jnp.asarray(np.array([42], dtype=np.uint32))
    tree = merkle.commit([col])
    dec = merkle.decommit(tree, [0])
    assert merkle.verify_decommitment(tree.root(), 0, 1, [0], dec)
