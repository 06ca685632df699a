"""FRI prover/verifier roundtrip, soundness tampers, degree enforcement."""

import numpy as np
import jax.numpy as jnp

from cairo_m_tpu.field import qm31
from cairo_m_tpu.prover.stark import domain, fft, fri
from cairo_m_tpu.prover.stark.channel import Blake2sChannel

P = (1 << 31) - 1
RNG = np.random.default_rng(11)
CFG = fri.FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=12)


def low_degree_column(log_size, log_degree):
    """QM31 evals (FFT order — the FriProver input convention) of a random
    poly with deg < 2^log_degree."""
    limbs = []
    for _ in range(4):
        coeffs = np.zeros(1 << log_size, dtype=np.uint32)
        k = 1 << (log_size - log_degree)
        coeffs[::k][: 1 << log_degree] = RNG.integers(0, P, size=1 << log_degree, dtype=np.uint32)
        # only indices i*2^(log_size-log_degree) are degree-embedded low indices
        limbs.append(fft.fft(jnp.asarray(coeffs), log_size))
    return tuple(limbs)


def column_host(col, log_size):
    """Commit-order host copies (the verifier opens commit positions)."""
    return [domain.bit_reverse(np.asarray(c), log_size) for c in col]


def make_values(cols_by_log, queries, max_log):
    out = {}
    for l, cols in cols_by_log.items():
        pairs = fri.pair_positions(queries, max_log, l)
        vals = []
        for col in cols:
            h = column_host(col, l)
            vals.append({p: tuple(int(h[j][p]) for j in range(4)) for p in pairs})
        out[l] = vals
    return out


def run_roundtrip(cols_by_log, tamper=None):
    columns = [(l, c) for l, cs in cols_by_log.items() for c in cs]
    ch = Blake2sChannel()
    ch.mix_u64(42)
    prover = fri.FriProver(ch, columns, CFG)
    queries = ch.draw_queries(CFG.n_queries, prover.max_log)
    proof = prover.decommit(queries)
    if tamper:
        proof = tamper(proof)
    vch = Blake2sChannel()
    vch.mix_u64(42)
    verifier = fri.FriVerifier(vch, CFG, [l for l, _ in columns], proof)
    vqueries = vch.draw_queries(CFG.n_queries, prover.max_log)
    if tamper is None:
        # honest proof: verifier must derive the same queries
        assert vqueries == queries
    elif vqueries != queries:
        # tampering diverged the transcript; queries mismatch = rejection
        return False
    values = make_values(cols_by_log, queries, prover.max_log)
    return verifier.verify_queries(queries, values)


def test_fri_single_column_roundtrip():
    cols = {8: [low_degree_column(8, 7)]}
    assert run_roundtrip(cols)


def test_fri_mixed_sizes_roundtrip():
    cols = {
        8: [low_degree_column(8, 7), low_degree_column(8, 7)],
        6: [low_degree_column(6, 5)],
        5: [low_degree_column(5, 4)],
    }
    assert run_roundtrip(cols)


def test_fri_rejects_high_degree():
    # degree == size (no blowup margin) must fail the last-layer degree check
    bad = low_degree_column(6, 6)
    assert not run_roundtrip({6: [bad]})


def test_fri_rejects_tampered_last_layer():
    cols = {7: [low_degree_column(7, 6)]}

    def tamper(proof):
        ll = [list(q) for q in proof.last_layer]
        ll[0][0] = (ll[0][0] + 1) % P
        proof.last_layer = [tuple(q) for q in ll]
        return proof

    ch_fail = False
    try:
        ok = run_roundtrip(cols, tamper)
    except ValueError:
        ok = False
    assert not ok


def test_fri_rejects_wrong_values():
    cols = {7: [low_degree_column(7, 6)]}
    columns = [(7, cols[7][0])]
    ch = Blake2sChannel()
    ch.mix_u64(42)
    prover = fri.FriProver(ch, columns, CFG)
    queries = ch.draw_queries(CFG.n_queries, 7)
    proof = prover.decommit(queries)
    vch = Blake2sChannel()
    vch.mix_u64(42)
    verifier = fri.FriVerifier(vch, CFG, [7], proof)
    vch.draw_queries(CFG.n_queries, 7)
    values = make_values(cols, queries, 7)
    k = next(iter(values[7][0]))
    v = list(values[7][0][k])
    v[0] = (v[0] + 1) % P
    values[7][0][k] = tuple(v)
    assert not verifier.verify_queries(queries, values)


def test_fri_proof_json_roundtrip():
    cols = {6: [low_degree_column(6, 5)]}
    columns = [(6, cols[6][0])]
    ch = Blake2sChannel()
    ch.mix_u64(1)
    prover = fri.FriProver(ch, columns, CFG)
    queries = ch.draw_queries(CFG.n_queries, 6)
    proof = prover.decommit(queries)
    proof2 = fri.FriProof.from_json_obj(proof.to_json_obj())
    vch = Blake2sChannel()
    vch.mix_u64(1)
    verifier = fri.FriVerifier(vch, CFG, [6], proof2)
    vch.draw_queries(CFG.n_queries, 6)
    assert verifier.verify_queries(queries, make_values(cols, queries, 6))
