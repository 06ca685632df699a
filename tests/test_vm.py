"""VM + runner behavioral tests against hand-assembled programs."""

import pytest

from cairo_m_tpu.isa.abi_codec import InputValue
from cairo_m_tpu.isa.instruction import Instruction, INSTRUCTION_MAX_SIZE
from cairo_m_tpu.isa.program import Program
from cairo_m_tpu.utils.sample_programs import fibonacci_loop_program, u32_ops_program
from cairo_m_tpu.vm.runner import RunnerOptions, run_cairo_program

P = (1 << 31) - 1


def fib(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, (a + b) % P
    return a


def test_instruction_roundtrip():
    ins = Instruction.make("U32StoreDivRemFpImm", src_off=1, imm_lo=2, imm_hi=3, dst_off=4, dst_rem_off=5)
    assert ins.size == 6 and INSTRUCTION_MAX_SIZE == 6
    words = ins.to_m31_list()
    assert Instruction.from_m31_list(words) == ins
    assert Instruction.from_json_obj(ins.to_json_obj()) == ins
    assert ins.to_qm31_vec() == [(22, 1, 2, 3), (4, 5, 0, 0)]


def test_program_json_roundtrip():
    prog = fibonacci_loop_program()
    prog2 = Program.from_json(prog.to_json())
    assert prog2.qm31_words() == prog.qm31_words()
    assert prog2.entrypoints["main"].pc == 0
    assert prog2.entrypoints["main"].params[0].ty.kind == "felt"


@pytest.mark.parametrize("n", [0, 1, 2, 10, 100])
def test_fibonacci(n):
    out = run_cairo_program(fibonacci_loop_program(), "main", [InputValue.number(n)])
    assert out.return_values[0].value == fib(n)


def test_fibonacci_trace_shape():
    out = run_cairo_program(fibonacci_loop_program(), "main", [InputValue.number(3)])
    seg = out.vm.segments[0]
    # 3 setup + 3*(1 jnz + 4 body + 1 jmp) + (1 jnz + 1 jmp exit) + 2 epilogue
    n_steps = 3 + 3 * 6 + 2 + 2
    assert len(seg.trace) == n_steps + 1  # final state appended
    assert seg.trace[0].pc == 0
    assert seg.trace[-1].pc == out.vm.final_pc
    # memory log: first entries are the instruction fetch of pc=0
    assert seg.memory_trace[0][0] == 0
    # public ranges
    assert out.public_address_ranges.program == range(0, 12)
    assert out.public_address_ranges.input == range(12, 13)
    assert out.public_address_ranges.output == range(13, 14)


def test_continuation_segments():
    out = run_cairo_program(
        fibonacci_loop_program(), "main", [InputValue.number(50)],
        RunnerOptions(max_steps=40),
    )
    segs = out.vm.segments
    assert len(segs) > 1
    assert out.return_values[0].value == fib(50)
    # chained: each segment's final registers == next segment's first registers
    for a, b in zip(segs, segs[1:]):
        assert a.trace[-1] == b.trace[0]
    # segment initial memory snapshots agree at program addresses
    for seg in segs:
        assert seg.initial_memory[0][0] == segs[0].initial_memory[0][0]


def test_u32_ops():
    a, b = 123456789, 987654321
    out = run_cairo_program(
        u32_ops_program(), "main",
        [InputValue.number(a), InputValue.number(b)],
    )
    x = (((a + b) * 3) & 0xFFFFFFFF) ^ (a & b)
    assert out.return_values[0].value == x
    assert out.return_values[1].value == 1  # a < b


def test_division_felt():
    # [fp-4]=x argument; returns x/7 * 7 == x
    from cairo_m_tpu.isa.instruction import Instruction as I
    from cairo_m_tpu.isa.program import AbiSlot, EntrypointInfo, FELT

    instrs = [
        I.make("StoreImm", imm=7, dst_off=0),
        I.make("StoreDivFpFp", src0_off=P - 4, src1_off=0, dst_off=1),
        I.make("StoreMulFpFp", src0_off=1, src1_off=0, dst_off=P - 3),
        I.make("Ret"),
    ]
    prog = Program.from_instructions(instrs)
    prog.entrypoints["main"] = EntrypointInfo(
        pc=0, params=[AbiSlot("x", FELT)], returns=[AbiSlot("r", FELT)]
    )
    out = run_cairo_program(prog, "main", [InputValue.number(123456)])
    assert out.return_values[0].value == 123456
