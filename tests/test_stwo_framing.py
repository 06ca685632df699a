"""Stwo-framing backend (PROTOCOL.md §3 parity path): stwo channel byte
framing + mixed-degree single-tree commitments, selected by
``PcsConfig(framing="stwo")``.

Reference: stwo import surface SURVEY.md §2.9 (``Blake2sChannel``,
``Blake2sMerkleChannel``/``Blake2sMerkleHasher``, ``CommitmentSchemeProver``),
transcript order SURVEY.md §2.6 steps 1-9 (unchanged by the backend swap —
only the channel byte framing and the commitment tree layout differ).
"""

import numpy as np
import pytest

from cairo_m_tpu.isa.program import PublicAddressRanges
from cairo_m_tpu.isa.state import Segment, State
from cairo_m_tpu.prover.adapter.adapter import import_from_runner_output
from cairo_m_tpu.prover.config import (
    STWO_FRAMING_96_BITS,
    set_production_scale,
    set_test_scale,
    test_config,
)
from cairo_m_tpu.prover.prove import Proof, prove_cairo_m
from cairo_m_tpu.prover.verify import VerificationError, verify_cairo_m
from cairo_m_tpu.prover.stark.stwo_channel import StwoBlake2sChannel
from cairo_m_tpu.prover.stark import stwo_merkle

P = (1 << 31) - 1

CFG = test_config(n_queries=8, pow_bits=2, framing="stwo")


@pytest.fixture(scope="module", autouse=True)
def _test_scale():
    set_test_scale(rc_big_bits=10, bitwise_log=8)
    yield
    set_production_scale()


# ---------------------------------------------------------------------------
# channel
# ---------------------------------------------------------------------------


def test_channel_draws_valid_felts():
    ch = StwoBlake2sChannel()
    ch.mix_u64(7)
    for q in ch.draw_felts(37):
        assert len(q) == 4
        assert all(0 <= x < P for x in q)


def test_channel_mix_changes_draws_and_resets_counter():
    a, b = StwoBlake2sChannel(), StwoBlake2sChannel()
    a.mix_u64(1)
    b.mix_u64(2)
    assert a.draw_felt() != b.draw_felt()
    # same mix -> same draw sequence; counter resets after a new mix
    c = StwoBlake2sChannel()
    c.mix_u64(1)
    a2 = StwoBlake2sChannel()
    a2.mix_u64(1)
    a2.draw_felt()
    a2.mix_felts([(1, 2, 3, 4)])
    c.draw_felt()
    c.mix_felts([(1, 2, 3, 4)])
    assert a2.draw_felt() == c.draw_felt()


def test_channel_rejection_sampling_batches():
    """The 8-word batch is rejected iff ANY word >= 2P (stwo convention):
    replaying draw_bytes by hand must land on the same accepted batch."""
    import hashlib
    import struct

    ch = StwoBlake2sChannel()
    ch.mix_u64(123456)
    digest = ch.digest
    expect = None
    for counter in range(1000):
        ctr = struct.pack("<Q", counter) + b"\x00" * 24
        words = struct.unpack(
            "<8I", hashlib.blake2s(digest + ctr).digest()
        )
        if all(w < 2 * P for w in words):
            expect = [w % P for w in words]
            break
    got = ch._draw_base_felts()
    assert got == expect


def test_channel_pow_grind_and_verify():
    ch = StwoBlake2sChannel()
    ch.mix_u64(99)
    nonce = ch.grind(6)
    assert ch.verify_pow(nonce, 6)
    assert not ch.verify_pow(nonce + 1, 20)
    # verify_pow must not mutate; mixing afterwards gives >= 6 tz
    ch.mix_u64(nonce)
    assert ch.trailing_zeros() >= 6


def test_channel_framing_differs_from_native():
    from cairo_m_tpu.prover.stark.channel import Blake2sChannel

    a, b = StwoBlake2sChannel(), Blake2sChannel()
    a.mix_u64(42)
    b.mix_u64(42)
    assert a.draw_felt() != b.draw_felt()


# ---------------------------------------------------------------------------
# mixed-degree merkle
# ---------------------------------------------------------------------------


def _random_tree(rng, logs):
    cols = [rng.integers(0, P, size=1 << l, dtype=np.uint32) for l in logs]
    return cols, stwo_merkle.StwoMerkleTree(cols)


def test_mixed_tree_roundtrip():
    rng = np.random.default_rng(7)
    logs = [6, 6, 4, 4, 4, 2, 6, 1]
    cols, tree = _random_tree(rng, logs)
    queries = {6: [0, 1, 13, 62], 4: [0, 3, 15], 2: [2], 1: [0]}
    queried, dec = tree.decommit(queries)
    assert stwo_merkle.verify_decommitment(
        tree.root(), logs, queries, queried, dec
    )
    # queried values match the columns at the sorted positions
    for ci, l in enumerate(logs):
        assert queried[ci] == [int(cols[ci][p]) for p in sorted(queries[l])]


def test_mixed_tree_rejects_tampering():
    rng = np.random.default_rng(8)
    logs = [5, 3, 3]
    _, tree = _random_tree(rng, logs)
    queries = {5: [4, 5, 21], 3: [1, 6]}
    queried, dec = tree.decommit(queries)
    bad = [list(c) for c in queried]
    bad[1][0] = (bad[1][0] + 1) % P
    assert not stwo_merkle.verify_decommitment(
        tree.root(), logs, queries, bad, dec
    )
    # truncated hash witness
    short = stwo_merkle.StwoDecommitment(
        dec.hash_witness[:-1], dec.column_witness
    )
    assert not stwo_merkle.verify_decommitment(
        tree.root(), logs, queries, queried, short
    )
    # extra column witness value
    extra = stwo_merkle.StwoDecommitment(
        dec.hash_witness, dec.column_witness + [1]
    )
    assert not stwo_merkle.verify_decommitment(
        tree.root(), logs, queries, queried, extra
    )


def test_hash_node_framing_is_raw_compress():
    """hash_node must be the raw compression (zero state, t=0, no finalize),
    NOT full blake2s — check a leaf against a direct _compress_np call."""
    from cairo_m_tpu.hash.blake2s import _compress_np

    vals = list(range(1, 17))
    state = [np.zeros((), np.uint32) for _ in range(8)]
    exp = np.stack(
        _compress_np(state, [np.uint32(v) for v in vals], 0, False)
    ).astype("<u4").tobytes()
    assert stwo_merkle.hash_node(None, vals) == exp
    import hashlib

    msg = b"".join(int(v).to_bytes(4, "little") for v in vals)
    assert stwo_merkle.hash_node(None, vals) != hashlib.blake2s(msg).digest()


# ---------------------------------------------------------------------------
# end-to-end under the stwo backend
# ---------------------------------------------------------------------------


def make_static_input(n_cells=5):
    mem = {
        i: ((i + 1, 2 * i, 3 * i, (7 * i) % 11), 0, 0) for i in range(n_cells)
    }
    seg = Segment(initial_memory=mem, memory_trace=[], trace=[State(0, 0)])
    return import_from_runner_output(seg, PublicAddressRanges.new(0, 0, 0))


@pytest.fixture(scope="module")
def stwo_proof():
    return prove_cairo_m(make_static_input(), CFG)


# the e2e group runs a full (small) proof on the CPU mesh — minutes, not
# seconds, so it lives in the slow tier; the channel/tree unit tests above
# stay fast
@pytest.mark.slow
def test_prove_verify_stwo_framing(stwo_proof):
    assert verify_cairo_m(stwo_proof, CFG)


@pytest.mark.slow
def test_stwo_phases_have_single_root(stwo_proof):
    for phase in stwo_proof.pcs_proof.phase_roots:
        assert len(phase) == 1  # one mixed-degree tree per phase


@pytest.mark.slow
def test_stwo_proof_json_roundtrip(stwo_proof):
    obj = stwo_proof.to_json_obj()
    import json

    back = Proof.from_json_obj(json.loads(json.dumps(obj)))
    assert verify_cairo_m(back, CFG)


@pytest.mark.slow
def test_stwo_proof_rejected_by_native_verifier(stwo_proof):
    # first divergence: the native verifier recomputes per-log_size
    # preprocessed roots, which can't match the single mixed-degree root
    native = test_config(n_queries=8, pow_bits=2)
    with pytest.raises(VerificationError):
        verify_cairo_m(stwo_proof, native)


@pytest.mark.slow
def test_stwo_tamper_rejection(stwo_proof):
    bad = Proof.from_json_obj(stwo_proof.to_json_obj())
    q = bad.pcs_proof.decommitments[1].queried
    ci = next(i for i, col in enumerate(q) if col)
    q[ci][0] = (q[ci][0] + 1) % P
    with pytest.raises(VerificationError):
        verify_cairo_m(bad, CFG)
