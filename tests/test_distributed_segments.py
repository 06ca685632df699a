"""Hermetic multi-process continuation proving (VERDICT r3 item #8): two
CPU processes in one jax.distributed job each prove alternating segments
of a capped fibonacci run; the coordinator checks the Poseidon2 root chain
and every proof verifies (inside the workers)."""

import pytest

from cairo_m_tpu.parallel.segments import prove_segments_multiprocess

FIB = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""


def test_two_process_segment_proving():
    records = prove_segments_multiprocess(
        FIB, "main", [40], max_steps=100, n_processes=2,
        test_scale={"rc_big_bits": 10, "bitwise_log": 8},
        test_config={"n_queries": 8, "pow_bits": 2},
    )
    assert len(records) >= 3
    for a, b in zip(records, records[1:]):
        assert a["final_root"] == b["initial_root"]
