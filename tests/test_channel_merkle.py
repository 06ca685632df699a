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
    # drawing twice gives different values
    c = Blake2sChannel()
    assert c.draw_felt() != c.draw_felt()
    # mixing resets draw counter deterministically
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
    assert not ch.verify_pow(nonce + 1, 8) or nonce + 1 == ch.grind(8)


def test_queries_distinct_sorted():
    ch = Blake2sChannel()
    ch.mix_u64(5)
    qs = ch.draw_queries(80, 12)
    assert len(qs) == 80 == len(set(qs))
    assert qs == sorted(qs)
    assert all(0 <= q < 4096 for q in qs)


def _mk_columns():
    cols = [
        (6, RNG.integers(0, P, size=64, dtype=np.uint32)),
        (6, RNG.integers(0, P, size=64, dtype=np.uint32)),
        (4, RNG.integers(0, P, size=16, dtype=np.uint32)),
        (2, RNG.integers(0, P, size=4, dtype=np.uint32)),
    ]
    return [(l, jnp.asarray(c)) for l, c in cols]


def test_merkle_commit_verify_roundtrip():
    cols = _mk_columns()
    tree = merkle.commit(cols)
    root = tree.root()
    positions = [0, 5, 17, 63, 62]
    dec = merkle.decommit(tree, positions)
    assert merkle.verify_decommitment(root, 6, [6, 6, 4, 2], positions, dec)
    # opened values match the actual columns
    for (l, c), got in zip([cols[0], cols[1]], dec.column_values[6]):
        for p, v in got.items():
            assert v == int(np.asarray(c[p]))
    # decommitment JSON roundtrip
    dec2 = merkle.MerkleDecommitment.from_json_obj(dec.to_json_obj())
    assert merkle.verify_decommitment(root, 6, [6, 6, 4, 2], positions, dec2)


def test_merkle_rejects_tampering():
    cols = _mk_columns()
    tree = merkle.commit(cols)
    root = tree.root()
    positions = [3, 40]
    dec = merkle.decommit(tree, positions)
    # tamper an opened value
    bad = merkle.MerkleDecommitment.from_json_obj(dec.to_json_obj())
    d6 = bad.column_values[6][0]
    k = next(iter(d6))
    d6[k] = (d6[k] + 1) % P
    assert not merkle.verify_decommitment(root, 6, [6, 6, 4, 2], positions, bad)
    # tamper a sibling hash
    bad2 = merkle.MerkleDecommitment.from_json_obj(dec.to_json_obj())
    hs = bad2.sibling_hashes[6]
    hs[0] = bytes([hs[0][0] ^ 1]) + hs[0][1:]
    assert not merkle.verify_decommitment(root, 6, [6, 6, 4, 2], positions, bad2)
    # wrong root
    assert not merkle.verify_decommitment(b"\x00" * 32, 6, [6, 6, 4, 2], positions, dec)


def test_merkle_adjacent_positions_no_redundant_siblings():
    cols = _mk_columns()
    tree = merkle.commit(cols)
    dec = merkle.decommit(tree, [6, 7])  # siblings of each other at leaf depth
    assert len(dec.sibling_hashes[6]) == 0
    assert merkle.verify_decommitment(tree.root(), 6, [6, 6, 4, 2], [6, 7], dec)
