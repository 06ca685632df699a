"""Pallas TPU executor for wide-tape constraint plans (stark/wtape.py).

The lax.scan interpreter streams the whole (R, tile) register file through
HBM on every scheduled step; at production sizes that made constraint
evaluation the composition-phase bottleneck (~0.5 s per big component on
v5e).  This kernel keeps the register file in VMEM for the whole program:

- the file is (R + B + C, TILE): R scratch registers, the B bank rows
  (copied from the input block at kernel start), and the C runtime
  constants broadcast into rows — so EVERY operand is one dynamic VMEM
  row read, with all operand indices remapped on the host (no selects);
- the (S, W) instruction grid arrives as scalar-prefetch arrays (SMEM);
  the W lanes of a step are unrolled, steps run under `fori_loop`;
- grid = row tiles of the 2^elog domain; instructions execute once per
  tile with (1, TILE) vector ops on the VPU.

Per-instruction cost ~tens of cycles vs the scan path's HBM round trip —
measured ~20x on the fibonacci-100k composition kernels.  Bit-identical to
the scan interpreter (cross-checked in tests/test_pallas.py, and the
CPU/TPU proof byte-equality covers it end to end).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK16 = np.uint32(0xFFFF)
MASK15 = np.uint32(0x7FFF)
P_U32 = np.uint32((1 << 31) - 1)

_INTERPRET = bool(os.environ.get("CM_PALLAS_INTERPRET"))

# plans larger than this keep the scan path (SMEM instruction budget);
# domains smaller than this are latency-bound either way
MAX_STEPS = 64
MIN_ELOG = 14


def _m31_add(a, b):
    s = a + b
    return jnp.where(s >= P_U32, s - P_U32, s)


def _m31_mul(a, b):
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    lo = a0 * b0
    mid = a0 * b1 + a1 * b0
    hi = a1 * b1

    def red(s):
        s = (s & P_U32) + (s >> 31)
        return jnp.where(s >= P_U32, s - P_U32, s)

    r = _m31_add(red(lo), red((mid & MASK15) << 16))
    r = _m31_add(r, mid >> 15)
    return _m31_add(r, red(hi << 1))


def _kernel(B: int, S: int, W: int, R: int, C: int, n_out: int, tile: int):
    RBC = R + B + C

    def kernel(base_ref, ia_ref, ib_ref, dst_ref, out_regs_ref, consts_ref,
               rows_ref, out_ref, file_ref):
        # zero the register rows: VMEM scratch is uninitialized on real
        # TPUs (the interpret path zero-fills, masking any plan that reads
        # a register before writing it — ADVICE r4 #4)
        if R:
            file_ref[pl.ds(0, R), :] = jnp.zeros((R, tile), jnp.uint32)
        # bank rows -> file[R : R+B]
        file_ref[pl.ds(R, B), :] = rows_ref[:, :]
        # const rows -> file[R+B : R+B+C]  (broadcast scalars)
        for j in range(C):
            file_ref[R + B + j, :] = jnp.full((tile,), consts_ref[j],
                                              jnp.uint32)

        def step(s, _):
            for w in range(W):
                bse = base_ref[s, w]
                va = file_ref[pl.ds(ia_ref[s, w], 1), :]
                vb = file_ref[pl.ds(ib_ref[s, w], 1), :]
                vbn = jnp.where(
                    bse == 1, jnp.where(vb == 0, vb, P_U32 - vb), vb
                )
                addsub = _m31_add(va, vbn)
                mul_ = _m31_mul(va, vb)
                out = jnp.where(bse == 2, mul_, addsub)
                file_ref[pl.ds(dst_ref[s, w], 1), :] = out
            return 0

        jax.lax.fori_loop(0, S, step, 0)
        for k in range(n_out):
            out_ref[k, :] = file_ref[pl.ds(out_regs_ref[k], 1), :][0]

    return kernel


def _pick_tile(RBC: int) -> int:
    tile = 1 << 13
    while tile > 512 and RBC * tile * 4 > (4 << 20):
        tile >>= 1
    return tile


@lru_cache(maxsize=None)
def _call(B: int, S: int, W: int, R: int, C: int, n_out: int, n: int):
    tile = min(_pick_tile(R + B + C), n)
    grid = n // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, tile), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R + B + C, tile), jnp.uint32)],
    )
    return pl.pallas_call(
        _kernel(B, S, W, R, C, n_out, tile),
        out_shape=jax.ShapeDtypeStruct((n_out, n), jnp.uint32),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
    )


def supported(plan, elog: int) -> bool:
    # never auto-selected on CPU (tests exercise it by calling run_plan
    # directly under CM_PALLAS_INTERPRET)
    return (
        jax.default_backend() not in ("cpu",)
        and plan.n_steps <= MAX_STEPS
        and elog >= MIN_ELOG
    )


def run_plan(rows, const_vals, plan, elog: int):
    """Execute a WidePlan over prepared (B, 2^elog) row-order bank rows.

    ``rows``: device (B, n) uint32, already fft->row reordered and shifted
    (wtape._prep_bank).  Returns (n_out, n) uint32 limbs."""
    n = 1 << elog
    B = int(rows.shape[0])
    R = plan.n_regs
    C = len(plan.consts)
    S, W = plan.n_steps, plan.width
    n_out = len(plan.out_regs)

    cache = plan.__dict__.setdefault("_pallas_cache", None)
    if cache is None:
        # remap every operand to a single file index:
        #   register r -> r;  bank b -> R + b;  const c -> R + B + c
        base = (plan.opc // 9).astype(np.int32)
        sa = ((plan.opc // 3) % 3).astype(np.int32)
        sb = (plan.opc % 3).astype(np.int32)

        def remap(space, idx):
            out = idx.astype(np.int32).copy()
            out[space == 1] += R
            out[space == 2] += R + B
            return out

        ia = remap(sa, plan.ia)
        ib = remap(sb, plan.ib)
        cache = (
            jnp.asarray(base), jnp.asarray(ia), jnp.asarray(ib),
            jnp.asarray(plan.dst.astype(np.int32)),
            jnp.asarray(plan.out_regs.astype(np.int32)),
        )
        plan._pallas_cache = cache
    base_d, ia_d, ib_d, dst_d, out_regs_d = cache
    return _call(B, S, W, R, C, n_out, n)(
        base_d, ia_d, ib_d, dst_d, out_regs_d,
        jnp.asarray(const_vals), rows,
    )
