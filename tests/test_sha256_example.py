"""The SHA-256 example program (examples/sha256/sha256.cm) vs hashlib —
the reference's examples/sha256-cairo-m integration tests, differentially
checked against Python's sha256."""

import hashlib
import os
import struct

from cairo_m_tpu.compiler import compile_cairo
from cairo_m_tpu.vm.runner import run_cairo_program

SRC = os.path.join(
    os.path.dirname(__file__), "..", "examples", "sha256", "sha256.cm"
)


def digest_words(data: bytes):
    d = hashlib.sha256(data).digest()
    return [int.from_bytes(d[i * 4 : i * 4 + 4], "big") for i in range(8)]


def test_sha256_abc():
    prog = compile_cairo(open(SRC).read(), "sha256").program
    r = run_cairo_program(prog, "main", [])
    assert r.return_values[0].flatten() == digest_words(b"abc")


def test_sha256_1kib():
    prog = compile_cairo(open(SRC).read(), "sha256").program
    msg = b"".join(
        struct.pack(">I", i * 16 + j) for i in range(16) for j in range(16)
    )
    r = run_cairo_program(prog, "bench1k", [])
    assert r.return_values[0].flatten() == digest_words(msg)
    # bitwise-heavy long trace: the sha bench workload's scale
    assert len(r.vm.segments[0].trace) > 100_000
