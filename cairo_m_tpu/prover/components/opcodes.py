"""Opcode component specifications (reference components/opcodes/* —
SURVEY.md §2.5).  One component per provable opcode, built on the
declarative DSL in `opcode_base.py`.  Debug prints (46, 47) are unproven,
as in the reference.

Conventions (matching the VM handlers in vm/vm.py exactly):
- access lists follow the handler's memory-op order;
- nonlinear write values commit a value column (see opcode_base.Write);
- conditional next_pc commits a hint column with linking constraints.
"""

from __future__ import annotations

import numpy as np

from ...field import m31
from .opcode_base import GenericOpcodeComponent, Hint, OpcodeSpec, Read, Write

P = (1 << 31) - 1

U16 = 1 << 16


def _specs():
    S = []

    # --- felt arithmetic fp fp (opcodes 0-3) ---
    def felt_fp_fp(name, opcode, op):
        return OpcodeSpec(
            name=name, opcode=opcode,
            accesses=[
                Read(lambda ns: ns["fp"] + ns["src0_off"], "op0"),
                Read(lambda ns: ns["fp"] + ns["src1_off"], "op1"),
                Write(
                    lambda ns: ns["fp"] + ns["dst_off"], op, "dst_prev",
                    commit_value=True, value_name="dst_val",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1,
            next_fp=None,
        )

    S.append(felt_fp_fp("store_add_fp_fp", 0, lambda ns: ns["op0"] + ns["op1"]))
    S.append(felt_fp_fp("store_sub_fp_fp", 1, lambda ns: ns["op0"] - ns["op1"]))
    S.append(felt_fp_fp("store_mul_fp_fp", 2, lambda ns: ns["op0"] * ns["op1"]))

    # div: dst = op0 * inv(op1); hint inv1; constraint op1*inv1 == 1
    def div_inv_hint(ctx):
        op1 = ctx["operands"][:, 1, 2]
        return m31.inv_np(op1)

    S.append(
        OpcodeSpec(
            name="store_div_fp_fp", opcode=3,
            accesses=[
                Read(lambda ns: ns["fp"] + ns["src0_off"], "op0"),
                Read(lambda ns: ns["fp"] + ns["src1_off"], "op1"),
                Write(
                    lambda ns: ns["fp"] + ns["dst_off"],
                    lambda ns: ns["op0"] * ns["inv1"], "dst_prev",
                    commit_value=True, value_name="dst_val",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
            hints=[Hint("inv1", div_inv_hint)],
            constraints=lambda ns, ev, rel: ev.add_constraint(
                ns["enabler"] * (ns["op1"] * ns["inv1"] - 1)
            ),
        )
    )

    # --- felt arithmetic fp imm (4, 6) ---
    S.append(
        OpcodeSpec(
            name="store_add_fp_imm", opcode=4,
            accesses=[
                Read(lambda ns: ns["fp"] + ns["src_off"], "op0"),
                Write(
                    lambda ns: ns["fp"] + ns["dst_off"],
                    lambda ns: ns["op0"] + ns["imm"], "dst_prev",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
        )
    )
    S.append(
        OpcodeSpec(
            name="store_mul_fp_imm", opcode=6,
            accesses=[
                Read(lambda ns: ns["fp"] + ns["src_off"], "op0"),
                Write(
                    lambda ns: ns["fp"] + ns["dst_off"],
                    lambda ns: ns["op0"] * ns["imm"], "dst_prev",
                    commit_value=True, value_name="dst_val",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
        )
    )

    # --- assert (50) ---
    S.append(
        OpcodeSpec(
            name="assert_eq_fp_imm", opcode=50,
            accesses=[Read(lambda ns: ns["fp"] + ns["src_off"], "op0")],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
            constraints=lambda ns, ev, rel: ev.add_constraint(
                ns["enabler"] * (ns["op0"] - ns["imm"])
            ),
        )
    )

    # --- memory (8, 42, 9, 43, 44, 45) ---
    S.append(
        OpcodeSpec(
            name="store_double_deref_fp", opcode=8,
            accesses=[
                Read(lambda ns: ns["fp"] + ns["base_off"], "base"),
                Read(lambda ns: ns["base"] + ns["imm"], "loaded"),
                Write(
                    lambda ns: ns["fp"] + ns["dst_off"],
                    lambda ns: ns["loaded"], "dst_prev",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
        )
    )
    S.append(
        OpcodeSpec(
            name="store_double_deref_fp_fp", opcode=42,
            accesses=[
                Read(lambda ns: ns["fp"] + ns["base_off"], "base"),
                Read(lambda ns: ns["fp"] + ns["offset_off"], "off"),
                Read(lambda ns: ns["base"] + ns["off"], "loaded"),
                Write(
                    lambda ns: ns["fp"] + ns["dst_off"],
                    lambda ns: ns["loaded"], "dst_prev",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
        )
    )
    S.append(
        OpcodeSpec(
            name="store_imm", opcode=9,
            accesses=[
                Write(
                    lambda ns: ns["fp"] + ns["dst_off"],
                    lambda ns: ns["imm"], "dst_prev",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
        )
    )
    S.append(
        OpcodeSpec(
            name="store_frame_pointer", opcode=43,
            accesses=[
                Write(
                    lambda ns: ns["fp"] + ns["dst_off"],
                    lambda ns: ns["fp"] + ns["imm"], "dst_prev",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
        )
    )
    S.append(
        OpcodeSpec(
            name="store_to_double_deref_fp_imm", opcode=44,
            accesses=[
                Read(lambda ns: ns["fp"] + ns["base_off"], "base"),
                Read(lambda ns: ns["fp"] + ns["src_off"], "srcv"),
                Write(
                    lambda ns: ns["base"] + ns["imm"],
                    lambda ns: ns["srcv"], "tgt_prev",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
        )
    )
    S.append(
        OpcodeSpec(
            name="store_to_double_deref_fp_fp", opcode=45,
            accesses=[
                Read(lambda ns: ns["fp"] + ns["base_off"], "base"),
                Read(lambda ns: ns["fp"] + ns["offset_off"], "off"),
                Read(lambda ns: ns["fp"] + ns["src_off"], "srcv"),
                Write(
                    lambda ns: ns["base"] + ns["off"],
                    lambda ns: ns["srcv"], "tgt_prev",
                ),
            ],
            next_pc=lambda ns: ns["pc"] + 1, next_fp=None,
        )
    )

    # --- call / ret (10, 11) ---
    S.append(
        OpcodeSpec(
            name="call_abs_imm", opcode=10,
            accesses=[
                Write(
                    lambda ns: ns["fp"] + ns["frame_off"],
                    lambda ns: ns["fp"], "save_fp_prev",
                ),
                Write(
                    lambda ns: ns["fp"] + ns["frame_off"] + 1,
                    lambda ns: ns["pc"] + 1, "save_pc_prev",
                ),
            ],
            next_pc=lambda ns: ns["target"],
            next_fp=lambda ns: ns["fp"] + ns["frame_off"] + 2,
        )
    )
    S.append(
        OpcodeSpec(
            name="ret", opcode=11,
            accesses=[
                Read(lambda ns: ns["fp"] - 1, "ret_pc"),
                Read(lambda ns: ns["fp"] - 2, "ret_fp"),
            ],
            next_pc=lambda ns: ns["ret_pc"],
            next_fp=lambda ns: ns["ret_fp"],
        )
    )

    # --- jumps (12, 13, 14) ---
    S.append(
        OpcodeSpec(
            name="jmp_abs_imm", opcode=12,
            accesses=[],
            next_pc=lambda ns: ns["target"], next_fp=None,
        )
    )
    S.append(
        OpcodeSpec(
            name="jmp_rel_imm", opcode=13,
            accesses=[],
            next_pc=lambda ns: ns["pc"] + ns["offset"], next_fp=None,
        )
    )

    # jnz: taken = (cond != 0); committed hints: taken, cond_inv, next_pc
    def jnz_taken(ctx):
        return (ctx["operands"][:, 0, 2] != 0).astype(np.uint32)

    def jnz_inv(ctx):
        cond = ctx["operands"][:, 0, 2]
        return np.where(cond == 0, 0, m31.inv_np(np.where(cond == 0, 1, cond)))

    def jnz_next_pc(ctx):
        cond = ctx["operands"][:, 0, 2]
        offset = ctx["words"][:, 2]
        return np.where(
            cond != 0, (ctx["pc"].astype(np.uint64) + offset) % P, (ctx["pc"] + 1) % P
        ).astype(np.uint32)

    def jnz_constraints(ns, ev, rel):
        en, t = ns["enabler"], ns["taken"]
        ev.add_constraint(en * t * (1 - t))
        # cond != 0 -> taken = 1 ; cond == 0 -> taken = 0
        ev.add_constraint(en * (ns["cond"] * ns["cond_inv"] - t))
        ev.add_constraint(en * ns["cond"] * (1 - t))
        # next_pc linkage
        ev.add_constraint(
            en * t * (ns["npc"] - ns["pc"] - ns["offset"])
        )
        ev.add_constraint(en * (1 - t) * (ns["npc"] - ns["pc"] - 1))

    S.append(
        OpcodeSpec(
            name="jnz_fp_imm", opcode=14,
            accesses=[Read(lambda ns: ns["fp"] + ns["cond_off"], "cond")],
            next_pc=lambda ns: ns["npc"], next_fp=None,
            hints=[
                Hint("taken", jnz_taken),
                Hint("cond_inv", jnz_inv),
                Hint("npc", jnz_next_pc),
            ],
            constraints=jnz_constraints,
        )
    )

    return S


_SPECS = None


def make_opcode_components(relations):
    global _SPECS
    if _SPECS is None:
        _SPECS = _specs()
    comps = [GenericOpcodeComponent(relations, sp) for sp in _SPECS]
    return sorted(comps, key=lambda c: c.spec.opcode)
