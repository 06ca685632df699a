"""Tape-compiled constraint evaluation: constraint programs as *data*.

XLA compile time is superlinear in graph size (measured ~500 s for a 40k-op
graph on TPU), and a symbolic per-component composition graph easily reaches
that scale (every QM31 mul is ~25 uint32 primitives).  Jitting one graph per
component — the direct translation of stwo's `FrameworkEval` — is therefore
a non-starter on TPU.

Instead, a component's `evaluate()` is *recorded* once per proof into a
linear tape of M31-level register instructions, and a single generic jitted
interpreter (`tape_kernel`) executes any tape:

- recording: `TapeOps` implements the same backend protocol as
  `DeviceOps`/`HostOps` (see stark/air.py) but its values are symbolic
  *sources* — `('r', ssa)`, `('b', bank_row)`, `('c', const_idx)` — and every
  arithmetic op appends one instruction (with hash-consing and const
  folding/identity simplification);
- register allocation: SSA liveness -> a small physical register file
  (registers 0-3 are the pinned QM31 output limbs, 4 is scratch for NOPs);
- execution: `lax.scan` over the tape; each step is a `lax.switch` over
  27 opcodes (3 base ops x 3 operand spaces x 3) doing two gathers, one
  modular op, and one register write.  The compiled graph is a few hundred
  primitives regardless of how many constraints a component has, so the
  kernel compiles in seconds and is shared by every component whose shape
  bucket matches.

The interpreter also performs the composition prologue: it LDEs nothing
itself — callers pass already-extended column stacks in **FFT order** (the
same arrays the PCS computed for committing) — but it materializes the
"bank" of (column, row-offset) masks with one fused gather, including the
row-order conversion and the circle-domain row shift.

Role-equivalent of the reference's constraint evaluation inside
`stwo::prove` (SURVEY.md §2.9), re-architected for XLA's compile model.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ...field import m31

P = (1 << 31) - 1

_ADD, _SUB, _MUL = 0, 1, 2


class TapeRecorder:
    """Accumulates instructions, constants and bank (input column) slots."""

    def __init__(self):
        self.instrs = []  # (base_op, src_a, src_b, ssa_dst)
        self.n_ssa = 0
        self.consts = []  # int values
        self._const_ix = {}
        self.bank = []  # (kind, idx, offset) in row order
        self._bank_ix = {}
        self._cse = {}

    # -- sources --

    def const(self, v) -> tuple:
        v = int(v) % P
        ix = self._const_ix.get(v)
        if ix is None:
            ix = len(self.consts)
            self._const_ix[v] = ix
            self.consts.append(v)
        return ("c", ix)

    def bank_src(self, kind: str, idx: int, offset: int) -> tuple:
        key = (kind, idx, offset)
        ix = self._bank_ix.get(key)
        if ix is None:
            ix = len(self.bank)
            self._bank_ix[key] = ix
            self.bank.append(key)
        return ("b", ix)

    # -- emission with simplification + hash-consing --

    def emit(self, op: int, a: tuple, b: tuple) -> tuple:
        if a[0] == "c" and b[0] == "c":
            va, vb = self.consts[a[1]], self.consts[b[1]]
            if op == _ADD:
                return self.const(va + vb)
            if op == _SUB:
                return self.const(va - vb)
            return self.const(va * vb)
        if op == _ADD:
            if a[0] == "c" and self.consts[a[1]] == 0:
                return b
            if b[0] == "c" and self.consts[b[1]] == 0:
                return a
            if b < a:  # canonicalize commutative ops for CSE
                a, b = b, a
        elif op == _SUB:
            if b[0] == "c" and self.consts[b[1]] == 0:
                return a
        else:  # MUL
            for x, y in ((a, b), (b, a)):
                if x[0] == "c":
                    if self.consts[x[1]] == 0:
                        return self.const(0)
                    if self.consts[x[1]] == 1:
                        return y
            if b < a:
                a, b = b, a
        key = (op, a, b)
        hit = self._cse.get(key)
        if hit is not None:
            return hit
        dst = ("r", self.n_ssa)
        self.n_ssa += 1
        self.instrs.append((op, a, b, dst[1]))
        self._cse[key] = dst
        return dst


class TapeOps:
    """Backend protocol (stark/air.py) over symbolic tape sources.

    Base values are single sources; extension (QM31) values are 4-tuples of
    sources.  Mirrors the limb formulas of field/qm31.py exactly.
    """

    is_host = False

    def __init__(self, rec: TapeRecorder):
        self.rec = rec

    # base field
    def badd(self, a, b):
        return self.rec.emit(_ADD, a, b)

    def bsub(self, a, b):
        return self.rec.emit(_SUB, a, b)

    def bmul(self, a, b):
        return self.rec.emit(_MUL, a, b)

    def bneg(self, a):
        return self.rec.emit(_SUB, self.rec.const(0), a)

    def bconst(self, c, like=None):
        return self.rec.const(c)

    def embed(self, b):
        z = self.rec.const(0)
        return (b, z, z, z)

    def econst(self, q):
        return tuple(self.rec.const(int(x)) for x in q)

    # extension field (QM31 = CM31[u]/(u^2 - (2+i)))
    def eadd(self, x, y):
        return tuple(self.badd(a, b) for a, b in zip(x, y))

    def esub(self, x, y):
        return tuple(self.bsub(a, b) for a, b in zip(x, y))

    def eneg(self, x):
        return tuple(self.bneg(a) for a in x)

    def emul_b(self, x, s):
        return tuple(self.bmul(a, s) for a in x)

    def _cmul(self, p, q):
        return (
            self.bsub(self.bmul(p[0], q[0]), self.bmul(p[1], q[1])),
            self.badd(self.bmul(p[0], q[1]), self.bmul(p[1], q[0])),
        )

    def _cmul_r(self, p):
        return (
            self.bsub(self.badd(p[0], p[0]), p[1]),
            self.badd(p[0], self.badd(p[1], p[1])),
        )

    def emul(self, x, y):
        a_, b_ = (x[0], x[1]), (x[2], x[3])
        c_, d_ = (y[0], y[1]), (y[2], y[3])
        ac = self._cmul(a_, c_)
        bd = self._cmul(b_, d_)
        ad = self._cmul(a_, d_)
        bc = self._cmul(b_, c_)
        rbd = self._cmul_r(bd)
        return (
            self.badd(ac[0], rbd[0]),
            self.badd(ac[1], rbd[1]),
            self.badd(ad[0], bc[0]),
            self.badd(ad[1], bc[1]),
        )


# ---------------------------------------------------------------------------
# Register allocation + packing
# ---------------------------------------------------------------------------


def pack_tape(rec: TapeRecorder, outputs):
    """Dead-code elimination + liveness-based register allocation.

    Returns (tape int32 (T, 4), n_regs, consts uint32 (C,), scratch,
    used_bank) — ``used_bank`` lists the referenced rows of ``rec.bank``
    in the compacted order the tape's bank operands use (so a caller
    packing only a subset of outputs gathers only the columns it needs).

    ``outputs``: sources whose values end up in physical registers
    0..len(outputs)-1 (via trailing ``out + 0`` copy instructions);
    register len(outputs) is the NOP scratch.
    """
    zero = rec.const(0)
    n_out = len(outputs)
    scratch = n_out  # NOP destination; never allocated

    # DCE: keep only instructions reachable from the outputs
    live = {o[1] for o in outputs if o[0] == "r"}
    keep = []
    for op, a, b, d in reversed(rec.instrs):
        if d in live:
            keep.append((op, a, b, d))
            if a[0] == "r":
                live.add(a[1])
            if b[0] == "r":
                live.add(b[1])
    instrs = keep[::-1]
    n_t = len(instrs)

    # compact the bank to the rows actually referenced
    bank_map = {}
    used_bank = []

    def bank_ix(i):
        if i not in bank_map:
            bank_map[i] = len(used_bank)
            used_bank.append(i)
        return bank_map[i]

    last_use = {}
    for t, (op, a, b, d) in enumerate(instrs):
        if a[0] == "r":
            last_use[a[1]] = t
        if b[0] == "r":
            last_use[b[1]] = t
    for o in outputs:
        if o[0] == "r":
            last_use[o[1]] = n_t  # alive until the output copies

    phys = {}
    free = []
    next_reg = scratch + 1
    rows = []

    def src_code(s):
        if s[0] == "r":
            return 0, phys[s[1]]
        if s[0] == "b":
            return 1, bank_ix(s[1])
        return 2, s[1]

    for t, (op, a, b, d) in enumerate(instrs):
        sa, ia = src_code(a)
        sb, ib = src_code(b)
        dying = {s[1] for s in (a, b) if s[0] == "r" and last_use.get(s[1]) == t}
        for ssa in dying:
            free.append(phys.pop(ssa))
        if free:
            r = free.pop()
        else:
            r = next_reg
            next_reg += 1
        phys[d] = r
        rows.append((op * 9 + sa * 3 + sb, ia, ib, r))
    for k, o in enumerate(outputs):
        sa, ia = src_code(o)
        rows.append((_ADD * 9 + sa * 3 + 2, ia, zero[1], k))
    tape = np.array(rows, dtype=np.int32).reshape(len(rows), 4)
    consts = np.array(rec.consts, dtype=np.uint32)
    return tape, next_reg, consts, scratch, used_bank


def pad_tape(tape: np.ndarray, bucket: int, scratch: int) -> np.ndarray:
    if len(tape) == bucket:
        return tape
    nop = np.array([_ADD * 9, scratch, scratch, scratch], np.int32)
    pad = np.broadcast_to(nop, (bucket - len(tape), 4))
    return np.concatenate([tape, pad], axis=0)


def next_pow2(x: int) -> int:
    return 1 << max(0, (max(1, x) - 1).bit_length())


# ---------------------------------------------------------------------------
# Interpreter kernel
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _row_from_fft_perm(elog: int):
    """G with row_order[i] = fft_order[G[i]] (see domain.from_fft_order)."""
    n = 1 << elog
    g = np.zeros(n, dtype=np.int32)
    k = np.arange(n // 2)
    g[2 * k] = k
    g[2 * k + 1] = n - 1 - k
    return g


@lru_cache(maxsize=None)
def tape_kernel(stack_rows: tuple, B: int, T: int, R: int, n_out: int,
                elog: int, fft_order: bool):
    """Jitted interpreter.

    f(*stacks, src (B,) int32 into their concatenation, sh (B,) uint32 row
      shifts, consts (C,), tape (T, 4) int32) -> (n_out, n) row-order limbs.

    ``stack_rows``: row count of each input stack (zero-row stacks allowed).
    ``fft_order``: stacks are in FFT order (extended-domain composition
    path) — bank rows convert to row order via the slicing permutation;
    otherwise stacks are already row order (base-domain witness path).
    """
    n = 1 << elog
    G = jnp.asarray(_row_from_fft_perm(elog)) if fft_order else None

    def f(*args):
        stacks = args[: len(stack_rows)]
        src, sh, consts, tape = args[len(stack_rows):]
        ext_all = jnp.concatenate(
            [x for x in stacks if x.shape[0]], axis=0
        )
        rows = jnp.take(ext_all, src, axis=0)  # (B, n)
        pos = (jnp.arange(n, dtype=jnp.uint32)[None, :] + sh[:, None]) % n
        idx = jnp.take(G, pos) if fft_order else pos.astype(jnp.int32)
        bank = jnp.take_along_axis(rows, idx, axis=1)  # (B, n) row order

        # Branch-free step: `lax.switch` inside `lax.scan` is hostile to the
        # TPU compiler (27 branch computations x big buffers -> minutes of
        # compile); instead fetch each operand from every space and select.
        # The decoded operand pre-pass below splits the packed opcode into
        # (base_op, space_a, space_b) once, outside the scan.
        opc = tape[:, 0]
        dec = jnp.stack(
            [opc // 9, (opc // 3) % 3, opc % 3, tape[:, 1], tape[:, 2],
             tape[:, 3]],
            axis=1,
        )

        def fetch(space, i, regs):
            r = jax.lax.dynamic_index_in_dim(regs, i, 0, keepdims=False)
            b = jax.lax.dynamic_index_in_dim(bank, i, 0, keepdims=False)
            c = jnp.broadcast_to(jnp.take(consts, jnp.minimum(i, consts.shape[0] - 1)), (n,))
            return jnp.where(space == 0, r, jnp.where(space == 1, b, c))

        def step(regs, ins):
            base, sa, sb, ia, ib, dst = (
                ins[0], ins[1], ins[2], ins[3], ins[4], ins[5],
            )
            va = fetch(sa, ia, regs)
            vb = fetch(sb, ib, regs)
            out = jnp.where(
                base == _ADD,
                m31.add(va, vb),
                jnp.where(base == _SUB, m31.sub(va, vb), m31.mul(va, vb)),
            )
            regs = jax.lax.dynamic_update_slice(
                regs, out[None], (dst, jnp.int32(0))
            )
            return regs, None

        regs0 = jnp.zeros((R, n), jnp.uint32)
        regs, _ = jax.lax.scan(step, regs0, dec)
        return regs[:n_out]

    return jax.jit(f)


def run_tape(stacks, src, sh, consts, tape, n_regs, scratch, elog,
             fft_order=True, n_out=4, t_bucket_min=256, r_bucket_min=16):
    """Bucket shapes and execute.  ``stacks``: tuple of (K, 2^elog) device
    arrays; ``src`` indexes their concatenation.  Returns (n_out, n)."""
    B = len(src)
    Bb = next_pow2(B)
    Tb = max(t_bucket_min, next_pow2(len(tape)))
    Rb = max(r_bucket_min, next_pow2(n_regs))
    srcp = np.zeros(Bb, dtype=np.int32)
    srcp[:B] = src
    shp = np.zeros(Bb, dtype=np.uint32)
    shp[:B] = sh
    fn = tape_kernel(
        tuple(int(s.shape[0]) for s in stacks),
        Bb, Tb, Rb, n_out, elog, fft_order,
    )
    return fn(
        *stacks,
        jnp.asarray(srcp),
        jnp.asarray(shp),
        jnp.asarray(consts),
        jnp.asarray(pad_tape(tape, Tb, scratch)),
    )
