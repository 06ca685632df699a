"""Public data: registers, roots, clock, public memory entries + the
initial LogUp sum (reference public_data.rs — SURVEY.md §2.6 steps 4, and
verifier.rs:63-70 balance check).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..hash.poseidon2 import TREE_HEIGHT
from .relations import Relations
from .stark.fri import QZERO, qscalar_add
from ..field.qm31 import qinv_np

P = (1 << 31) - 1


def _extract_range(memory: dict, rng) -> list:
    out = []
    for addr in rng:
        e = memory.get(addr)
        out.append((addr, e[0], e[1]) if e is not None else None)
    return out


@dataclass
class PublicData:
    initial_registers: tuple  # (pc, fp)
    final_registers: tuple
    clock: int  # total steps
    initial_root: int
    final_root: int
    program: list  # [(addr, value4, clock) | None]
    input: list
    output: list

    @staticmethod
    def new(prover_input) -> "PublicData":
        pi = prover_input
        r = pi.public_address_ranges
        return PublicData(
            initial_registers=pi.initial_registers,
            final_registers=pi.final_registers,
            clock=pi.total_steps,
            initial_root=pi.merkle_trees.initial_root or 0,
            final_root=pi.merkle_trees.final_root or 0,
            program=_extract_range(pi.initial_memory, r.program),
            input=_extract_range(pi.initial_memory, r.input),
            output=_extract_range(pi.final_memory, r.output),
        )

    def mix_into(self, channel):
        channel.mix_u32s(
            [
                self.initial_registers[0],
                self.initial_registers[1],
                self.final_registers[0],
                self.final_registers[1],
                self.clock,
                self.initial_root,
                self.final_root,
            ]
        )
        channel.mix_u32s([len(self.program), len(self.input), len(self.output)])
        for entries in (self.program, self.input, self.output):
            flat = []
            for e in entries:
                if e is not None:
                    addr, v, clock = e
                    flat += [addr, v[0], v[1], v[2], v[3], clock]
            channel.mix_u32s(flat)

    def initial_logup_sum(self, relations: Relations):
        """Public contribution to the global LogUp balance
        (public_data.rs:287-393): emit initial registers / consume final,
        consume both roots, emit program+input / consume output memory
        entries plus their 4 Merkle-leaf consumptions each."""

        def comb(rel, vals):
            acc = QZERO
            for j, v in enumerate(vals):
                aj = rel.alpha_powers[j]
                vi = int(v)  # guard against numpy scalar overflow
                acc = qscalar_add(acc, tuple((int(x) * vi) % P for x in aj))
            return tuple((int(a) - int(z)) % P for a, z in zip(acc, rel.z))

        terms = []  # (sign, denom)
        terms.append((1, comb(relations.registers, [self.initial_registers[0], self.initial_registers[1], 1])))
        terms.append((-1, comb(relations.registers, [self.final_registers[0], self.final_registers[1], self.clock + 1])))
        terms.append((1, comb(relations.merkle, [0, 0, self.initial_root, self.initial_root])))
        terms.append((1, comb(relations.merkle, [0, 0, self.final_root, self.final_root])))

        def add_entries(entries, sign, root):
            for e in entries:
                if e is None:
                    continue
                addr, v, clock = e
                terms.append(
                    (sign, comb(relations.memory, [addr, clock, v[0], v[1], v[2], v[3]]))
                )
                for k in range(4):
                    terms.append(
                        (
                            -1,
                            comb(
                                relations.merkle,
                                [4 * addr + k, TREE_HEIGHT, v[k], root],
                            ),
                        )
                    )

        add_entries(self.program, 1, self.initial_root)
        add_entries(self.input, 1, self.initial_root)
        add_entries(self.output, -1, self.final_root)

        denoms = tuple(
            np.array([t[1][k] for t in terms], dtype=np.uint32) for k in range(4)
        )
        invs = qinv_np(denoms)
        total = QZERO
        for i, (sign, _) in enumerate(terms):
            inv = tuple(int(invs[k][i]) for k in range(4))
            if sign < 0:
                inv = tuple((P - x) % P for x in inv)
            total = qscalar_add(total, inv)
        return total

    # -- serialization --

    def to_json_obj(self):
        def ent(entries):
            return [
                None if e is None else [e[0], list(e[1]), e[2]] for e in entries
            ]

        return {
            "initial_registers": list(self.initial_registers),
            "final_registers": list(self.final_registers),
            "clock": self.clock,
            "initial_root": self.initial_root,
            "final_root": self.final_root,
            "program": ent(self.program),
            "input": ent(self.input),
            "output": ent(self.output),
        }

    @staticmethod
    def from_json_obj(o):
        def ent(entries):
            return [
                None if e is None else (e[0], tuple(e[1]), e[2]) for e in entries
            ]

        return PublicData(
            tuple(o["initial_registers"]),
            tuple(o["final_registers"]),
            o["clock"],
            o["initial_root"],
            o["final_root"],
            ent(o["program"]),
            ent(o["input"]),
            ent(o["output"]),
        )
