"""Component registry: fixed commitment order + generic witness plumbing.

Registry order (mixed into the transcript as each component's log_size):
generic components first, then opcode components by opcode number — the
reference's `Components` struct equivalent (components/mod.rs:106-445).

Range-check / bitwise multiplicities are counted *generically*: after all
other components' traces exist, their relation entries are re-derived and
every consumption (multiplicity = -enabler) of RangeCheckN / Bitwise is
histogrammed into the table component's multiplicity column.
"""

from __future__ import annotations

import numpy as np

from ..relations import Relations
from ..stark import framework
from .generic import (
    BITWISE_LOG_SIZE,
    BitwiseComponent,
    ClockUpdateComponent,
    MemoryComponent,
    MerkleComponent,
    Poseidon2Component,
    RangeCheckComponent,
)
from .opcodes import make_opcode_components

P = (1 << 31) - 1

_TOUCHED_CACHE: dict = {}


def _touched_relations(comp) -> set:
    """Relation *names* the component's evaluate() emits entries to, found
    by a 1-row dry run (cached per component name + protocol scale; names,
    not ids — Relations instances are per-proof)."""
    from ..config import SCALE
    from ..stark.air import EvalAtRow, HostArrayOps, Val

    key = (type(comp).__name__, comp.name, SCALE.key())
    hit = _TOUCHED_CACHE.get(key)
    if hit is not None:
        return hit
    rel = comp.relations
    saved = {id(r): (r.z, r.alpha_powers) for r in rel.all()}
    for r in rel.all():
        r.z = (0, 0, 0, 0)
        r.alpha_powers = [(1, 0, 0, 0)] * r.arity
    try:
        z1 = np.zeros(1, np.uint32)
        ev = EvalAtRow(
            HostArrayOps,
            lambda i, o: Val(z1, False, HostArrayOps),
            lambda i, o: Val((z1, z1, z1, z1), True, HostArrayOps),
            Val((z1, z1, z1, z1), True, HostArrayOps),
            lambda i, o: Val(z1, False, HostArrayOps),
        )
        ev.collect_only = True
        comp.evaluate(ev)
        touched = {e.relation.name for e in ev.relation_entries}
    finally:
        for r in rel.all():
            r.z, r.alpha_powers = saved[id(r)]
    _TOUCHED_CACHE[key] = touched
    return touched


class ComponentSet:
    """All components of one proof, in commitment order."""

    def __init__(self, relations: Relations):
        self.relations = relations
        self.memory = MemoryComponent(relations)
        self.merkle = MerkleComponent(relations)
        self.clock_update = ClockUpdateComponent(relations)
        self.poseidon2 = Poseidon2Component(relations)
        from ..config import SCALE

        self.range_check_8 = RangeCheckComponent(relations, 8)
        self.range_check_16 = RangeCheckComponent(relations, 16)
        self.range_check_20 = RangeCheckComponent(
            relations, SCALE.rc_big_bits, "range_check_20"
        )
        self.bitwise = BitwiseComponent(relations)
        self.opcodes = make_opcode_components(relations)  # list, opcode order
        self.all = [
            self.memory,
            self.merkle,
            self.clock_update,
            self.poseidon2,
            self.range_check_8,
            self.range_check_16,
            self.range_check_20,
            self.bitwise,
        ] + self.opcodes

    # -- witness generation --

    def write_traces(self, prover_input, on_component=None, table_counter=None):
        """Generate all witness traces.  ``on_component(comp)`` fires as soon
        as a component's rows exist — the prover uses it to start that
        component's (async) H2D upload while later components' witnesses are
        still being generated on host, overlapping the accelerator-tunnel
        transfer with host work.  The four table components fire last (their
        multiplicity columns need every other component's entries).

        ``table_counter`` (framework.TableCounter, single-device path):
        multiplicity histograms run as device scatter-adds over the uploaded
        stacks — the caller's ``on_component`` feeds the counter — and the
        host entry re-derivation below is skipped entirely."""
        non_table = [
            self.memory, self.merkle, self.clock_update, self.poseidon2,
        ] + self.opcodes
        for comp in non_table:
            comp.write_trace(prover_input)
            if on_component is not None:
                on_component(comp)
        if table_counter is not None:
            cols, touched = table_counter.finalize()
            tables = (
                self.range_check_8, self.range_check_16,
                self.range_check_20, self.bitwise,
            )
            for comp, col, t in zip(tables, cols, touched):
                comp.write_trace_device(col, t)
                if on_component is not None:
                    on_component(comp)
            return
        # count range-check / bitwise consumptions generically.  Only
        # components whose relation entries actually touch a table relation
        # need the (expensive) host entry re-derivation — the generic five
        # consume none (their lookups are Memory/Merkle/Poseidon2/Registers
        # only), which skips e.g. re-evaluating poseidon2's 443-column
        # constraint body on host arrays.  Membership is derived by dry-run
        # (_touched_relations), not hand-listed, so a new table consumer
        # can't be silently missed.
        table_rels = {
            self.relations.range_check_8.name,
            self.relations.range_check_16.name,
            self.relations.range_check_20.name,
            self.relations.bitwise.name,
        }
        counted = [
            c
            for c in [self.memory, self.merkle, self.clock_update, self.poseidon2]
            + self.opcodes
            if _touched_relations(c) & table_rels
        ]
        big = self.range_check_20.bits
        rc = {
            8: np.zeros(1 << 8, np.uint64),
            16: np.zeros(1 << 16, np.uint64),
            big: np.zeros(1 << big, np.uint64),
        }
        bw = np.zeros(1 << self.bitwise.log_size, np.uint64)
        rel_to_bits = {
            id(self.relations.range_check_8): 8,
            id(self.relations.range_check_16): 16,
            id(self.relations.range_check_20): big,
        }
        for comp in counted:
            if comp.zero_witness:
                continue  # all entry weights are -0 — nothing to histogram
            pp = comp.preprocessed_columns() if comp.n_preprocessed_cols else ()
            entries = framework._entries_host(comp, comp.trace_rows, pp)
            for e in entries:
                bits = rel_to_bits.get(id(e.relation))
                is_bw = e.relation is self.relations.bitwise
                if bits is None and not is_bw:
                    continue
                # consumption weight = -multiplicity (entries use -enabler)
                mult = e.multiplicity.as_ext().v[0]
                weight = ((P - mult.astype(np.uint64)) % P).astype(np.uint64)
                n = 1 << comp.log_size
                weight = np.broadcast_to(weight, (n,))
                if bits is not None:
                    vals = np.broadcast_to(e.values[0].v, (n,)).astype(np.uint64)
                    # mask out zero-weight (padding) rows: their values may be
                    # out of table range (e.g. clock diffs of -1)
                    sel = weight != 0
                    np.add.at(rc[bits], vals[sel], weight[sel])
                else:
                    op = np.broadcast_to(e.values[0].v, (n,)).astype(np.uint64)
                    a = np.broadcast_to(e.values[1].v, (n,)).astype(np.uint64)
                    b = np.broadcast_to(e.values[2].v, (n,)).astype(np.uint64)
                    idx = (op << 16) + (a << 8) + b
                    sel = weight != 0
                    np.add.at(bw, idx[sel], weight[sel])
        self.range_check_8.write_trace((rc[8] % P).astype(np.uint32))
        self.range_check_16.write_trace((rc[16] % P).astype(np.uint32))
        self.range_check_20.write_trace((rc[big] % P).astype(np.uint32))
        self.bitwise.write_trace((bw % P).astype(np.uint32))
        if on_component is not None:
            for comp in (
                self.range_check_8, self.range_check_16,
                self.range_check_20, self.bitwise,
            ):
                on_component(comp)

    # -- column enumeration for the PCS phases --

    def preprocessed_columns(self):
        """[(log_size, np col)] + per-component ownership slices."""
        cols = []
        owners = []
        for comp in self.all:
            if comp.n_preprocessed_cols:
                pcols = comp.preprocessed_columns()
                owners.append((comp, len(cols), len(pcols)))
                cols += [(comp.log_size, c) for c in pcols]
        return cols, owners

    def trace_columns(self):
        cols = []
        owners = []
        for comp in self.all:
            owners.append((comp, len(cols), len(comp.trace_rows)))
            cols += [(comp.log_size, c) for c in comp.trace_rows]
        return cols, owners

    def log_sizes(self):
        return [c.log_size for c in self.all]
