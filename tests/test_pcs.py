"""End-to-end PCS test: commit random trace columns, open at OODS points,
prove and verify; tampered values must fail."""

import numpy as np
import jax.numpy as jnp

from cairo_m_tpu.prover.stark import domain, fri, pcs
from cairo_m_tpu.prover.stark.channel import Blake2sChannel

P = (1 << 31) - 1
RNG = np.random.default_rng(21)

CFG = pcs.PcsConfig(
    pow_bits=4,
    fri_config=fri.FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=10),
)


def rand_col(log):
    return jnp.asarray(RNG.integers(0, P, size=1 << log, dtype=np.uint32))


def oods_point(channel):
    t = channel.draw_felt()
    td = tuple(jnp.uint32(int(x)) for x in t)
    x, y = domain.qpoint_from_t(td)
    return (
        tuple(int(np.asarray(c)) for c in x),
        tuple(int(np.asarray(c)) for c in y),
    )


def run(tamper_value=False, tamper_root=False):
    ch = Blake2sChannel()
    CFG.mix_into(ch)
    prover = pcs.CommitmentSchemeProver(ch, CFG)
    cols0 = [(6, rand_col(6)), (6, rand_col(6)), (5, rand_col(5))]
    cols1 = [(6, rand_col(6))]
    prover.commit(cols0)
    prover.commit(cols1)
    z = oods_point(ch)
    sample_points = [[[z], [z], [z]], [[z]]]
    proof = prover.prove_values(sample_points)

    if tamper_value:
        v = list(proof.sampled_values[0][0][0])
        v[0] = (v[0] + 1) % P
        proof.sampled_values[0][0][0] = tuple(v)
    vch = Blake2sChannel()
    CFG.mix_into(vch)
    verifier = pcs.CommitmentSchemeVerifier(vch, CFG)
    roots0 = proof.phase_roots[0]
    if tamper_root:
        roots0 = [(l, b"\x01" * 32) for l, _ in roots0]
    verifier.commit(roots0, [6, 6, 5])
    verifier.commit(proof.phase_roots[1], [6])
    vz = oods_point(vch)
    if vz != z and not (tamper_root):
        return False, "oods mismatch"
    return verifier.verify_values([[[vz], [vz], [vz]], [[vz]]], proof), "ok"


def test_pcs_honest_roundtrip():
    ok, msg = run()
    assert ok, msg


def test_pcs_rejects_tampered_value():
    ok, _ = run(tamper_value=True)
    assert not ok


def test_pcs_rejects_tampered_root():
    ok, _ = run(tamper_root=True)
    assert not ok


def test_pcs_proof_json_roundtrip():
    ch = Blake2sChannel()
    CFG.mix_into(ch)
    prover = pcs.CommitmentSchemeProver(ch, CFG)
    prover.commit([(5, rand_col(5))])
    z = oods_point(ch)
    proof = prover.prove_values([[[z]]])
    obj = proof.to_json_obj()
    import json

    proof2 = pcs.PcsProof.from_json_obj(json.loads(json.dumps(obj)))
    vch = Blake2sChannel()
    CFG.mix_into(vch)
    verifier = pcs.CommitmentSchemeVerifier(vch, CFG)
    verifier.commit(proof2.phase_roots[0], [5])
    vz = oods_point(vch)
    assert verifier.verify_values([[[vz]]], proof2)
