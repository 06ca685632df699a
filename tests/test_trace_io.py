"""Binary trace export/import roundtrip (vm/trace_io.py; reference format
`crates/runner/src/vm/mod.rs:306-373`, reader `crates/prover/src/adapter/
io.rs:38-154`): VM -> files -> segments -> adapter -> proof verifies."""

import struct

import pytest

from cairo_m_tpu.compiler import compile_cairo
from cairo_m_tpu.isa.abi_codec import InputValue
from cairo_m_tpu.vm import trace_io
from cairo_m_tpu.vm.runner import RunnerOptions, run_cairo_program

FIB = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""


@pytest.fixture(scope="module")
def run_and_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("traces")
    program = compile_cairo(FIB).program
    res = run_cairo_program(
        program, "main", [InputValue.number(30)],
        RunnerOptions(max_steps=120),
    )
    assert len(res.vm.segments) >= 2  # exercises the per-segment naming
    paths = trace_io.export_run(res.vm, res.vm.program_length, str(d))
    return program, res, paths


def test_trace_file_layout(run_and_files):
    _, res, (tp, mp, ip) = run_and_files
    seg0 = res.vm.segments[0]
    data = open(trace_io._segment_path(tp, 0), "rb").read()
    # (fp, pc) LE u32 pairs, one per step (execution.rs:28-39)
    assert len(data) == 8 * len(seg0.trace)
    fp, pc = struct.unpack_from("<II", data, 0)
    assert (pc, fp) == (seg0.trace[0].pc, seg0.trace[0].fp)
    # memory file: u32 program-length header + 20-byte entries
    mdata = open(trace_io._segment_path(mp, 0), "rb").read()
    (plen,) = struct.unpack_from("<I", mdata, 0)
    assert plen == res.vm.program_length
    assert len(mdata) == 4 + 20 * len(seg0.memory_trace)
    addr, v0 = struct.unpack_from("<II", mdata, 4)
    assert (addr, v0) == (
        seg0.memory_trace[0][0],
        seg0.memory_trace[0][1][0],
    )


def test_segments_roundtrip_exact(run_and_files):
    _, res, (tp, mp, ip) = run_and_files
    base = tp[:-4]
    segs = trace_io.segments_from_files(
        tp, base + "_mem.bin", base + "_initmem.bin"
    )
    assert len(segs) == len(res.vm.segments)
    for got, want in zip(segs, res.vm.segments):
        assert [(s.pc, s.fp) for s in got.trace] == [
            (s.pc, s.fp) for s in want.trace
        ]
        assert got.memory_trace == [
            (a, tuple(v)) for a, v in want.memory_trace
        ]
        assert got.initial_memory == {
            a: (tuple(v), c, m)
            for a, (v, c, m) in want.initial_memory.items()
        }


def test_prove_from_files(run_and_files):
    from cairo_m_tpu.prover.adapter.adapter import import_from_runner_output
    from cairo_m_tpu.prover.config import (
        set_production_scale,
        set_test_scale,
        test_config,
    )
    from cairo_m_tpu.prover.prove import prove_cairo_m
    from cairo_m_tpu.prover.verify import verify_cairo_m

    _, res, (tp, mp, ip) = run_and_files
    base = tp[:-4]
    segs = trace_io.segments_from_files(
        tp, base + "_mem.bin", base + "_initmem.bin"
    )
    set_test_scale(rc_big_bits=10, bitwise_log=8)
    try:
        cfg = test_config(n_queries=8, pow_bits=2)
        pi = import_from_runner_output(segs[0], res.public_address_ranges)
        proof = prove_cairo_m(pi, cfg)
        assert verify_cairo_m(proof, cfg)
    finally:
        set_production_scale()


def test_cli_run_trace_output_and_prove_from_trace(tmp_path):
    import json
    import subprocess
    import sys

    prog = tmp_path / "fib.cm"
    prog.write_text(FIB)
    compiled = tmp_path / "fib.json"
    env_cmd = [sys.executable, "-m", "cairo_m_tpu.cli"]
    subprocess.run(
        env_cmd + ["compile", str(prog), "-o", str(compiled)],
        check=True, cwd="/root/repo",
    )
    subprocess.run(
        env_cmd + [
            "run", str(compiled), "--arguments", "10",
            "--trace-output", str(tmp_path / "t.bin"),
        ],
        check=True, cwd="/root/repo",
    )
    assert (tmp_path / "t_segment_0.bin").exists()
    assert (tmp_path / "t_mem_segment_0.bin").exists()
    assert (tmp_path / "t_initmem_segment_0.bin").exists()
