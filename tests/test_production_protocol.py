"""One CPU-runnable proof at the PRODUCTION protocol scale (VERDICT r3
weak #4): rc20 table 2^20, bitwise table 2^18, REGULAR_96_BITS (blowup 2,
80 queries, 16 PoW bits).  Every other e2e test shrinks the protocol; only
this test exercises the production floor off-TPU, so protocol-scale
regressions (table sizes, query counts, PoW) surface before bench.py runs
on hardware.  The *program* is tiny — scale here means protocol, not trace.
"""

import pytest

from cairo_m_tpu.compiler import compile_cairo
from cairo_m_tpu.isa.abi_codec import InputValue
from cairo_m_tpu.prover.adapter.adapter import import_from_runner_output
from cairo_m_tpu.prover.config import REGULAR_96_BITS, set_production_scale
from cairo_m_tpu.prover.prove import prove_cairo_m
from cairo_m_tpu.prover.verify import verify_cairo_m
from cairo_m_tpu.vm.runner import run_cairo_program

FIB = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""


def test_production_protocol_floor():
    set_production_scale()
    program = compile_cairo(FIB).program
    res = run_cairo_program(program, "main", [InputValue.number(30)])
    pi = import_from_runner_output(
        res.vm.segments[0], res.public_address_ranges
    )
    proof = prove_cairo_m(pi, REGULAR_96_BITS)
    assert verify_cairo_m(proof, REGULAR_96_BITS)
    # production preprocessed floor actually committed
    assert max(proof.log_sizes) >= 20
    assert proof.pcs_proof.fri_proof is not None
