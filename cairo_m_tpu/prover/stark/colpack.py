"""Column-packed host->device witness upload.

The accelerator tunnel moves host->device bytes at ~25-31 MB/s (measured on
the axon-tunneled v5e), so the phase-1 trace upload (~55 MB for fib-100k)
dominated the whole trace phase.  Witness columns are low-entropy: enabler
and flag columns are constant-then-zero, clock columns are monotone with
tiny deltas, prev-clock columns sit a small distance below the clock
column, multiplicity tables are almost-all-small counts.  This module
classifies each row on host (cheap NumPy passes), uploads only the packed
byte-planes, and reconstructs the exact uint32 (K, n) stack with one jitted
device program per (shape, classification) signature.

Encodings (host classifier `classify`):

  z          all-zero row — no upload
  c          value ``c`` for rows [0, m), zero after — params only
  d8 / d16   monotone row with deltas < 2^w on [0, m), zero after —
             upload w-bit deltas, reconstruct base + cumsum (clock columns)
  r8 / r16   ``ref - row`` in [0, 2^w) on [0, m), zero after, for some
             non-derived row ``ref`` of the same stack — upload w-bit
             diffs (prev-clock columns track the clock column)
  u8 / u16   whole row < 2^w — plain narrow upload
  x8 / x16   row < 2^w except <= n/64 entries — narrow base plane plus a
             sparse (index, value) exception list (multiplicity tables)
  u32        incompressible (field-sized values)

Reconstruction is bit-exact by construction and asserted in
tests/test_colpack.py against np.stack on real witnesses.

Reference context: the witness columns this uploads are the per-component
trace columns of SURVEY.md §2.5 (reference `Claim::write_trace`,
`crates/prover/src/components/`); the reference streams them through host
RAM and never pays a device link, so the packing layer is TPU-specific.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


# exceptions allowed per column for the x-encodings, as a fraction of n
_EXC_FRAC = 64


def classify(rows, m: int):
    """rows: list of (n,) uint32 arrays; m: non-padded length.

    -> (kinds, buffers) where kinds[j] is a tuple describing row j's
    encoding and buffers holds the packed planes + params (see `pack`).
    """
    n = int(rows[0].shape[0]) if rows else 0
    kinds = []
    b8, b16, b32 = [], [], []
    params = np.zeros((len(rows), 2), np.uint32)
    exc_idx, exc_val = [], []
    # rows eligible as references for r-encodings (index -> np row)
    refs = []

    for j, row in enumerate(rows):
        r = np.ascontiguousarray(np.asarray(row, np.uint32))
        mx = int(r.max()) if r.size else 0
        if mx == 0:
            kinds.append(("z",))
            continue
        c0 = int(r[0])
        pad_zero = m >= n or not r[m:].any()
        if pad_zero and mx == c0 and bool(np.all(r[:m] == c0)):
            kinds.append(("c",))
            params[j] = (c0, m)
            continue
        if mx < 256:
            kinds.append(("u8",))
            b8.append(r.astype(np.uint8))
            continue
        # monotone delta (clock-style columns)
        if pad_zero and m > 1:
            head = r[:m]
            d = np.diff(head)
            if d.size and not (d.astype(np.int64) < 0).any():
                dmax = int(d.max())
                if dmax < 256:
                    buf = np.zeros(n, np.uint8)
                    buf[1:m] = d.astype(np.uint8)
                    kinds.append(("d8",))
                    b8.append(buf)
                    params[j] = (c0, m)
                    refs.append((j, r))
                    continue
                if dmax < 65536:
                    buf = np.zeros(n, np.uint16)
                    buf[1:m] = d.astype(np.uint16)
                    kinds.append(("d16",))
                    b16.append(buf)
                    params[j] = (c0, m)
                    refs.append((j, r))
                    continue
        # small nonnegative offset below a reference row (prev-clocks)
        if pad_zero and refs:
            found = False
            probe = min(m, 4096)  # cheap prefix probe: full-row candidate
            # checks cost O(refs * m) and dominated packing on rows that
            # fail every reference (incompressible value columns)
            for rj, rr in refs:
                dprobe = rr[:probe].astype(np.int64) - r[:probe].astype(
                    np.int64
                )
                if dprobe.size and (
                    dprobe.min() < 0 or dprobe.max() >= 65536
                ):
                    continue
                diff = rr[:m].astype(np.int64) - r[:m].astype(np.int64)
                if diff.size and diff.min() >= 0 and diff.max() < 65536:
                    dmx = int(diff.max())
                    if dmx < 256:
                        buf = np.zeros(n, np.uint8)
                        buf[:m] = diff.astype(np.uint8)
                        kinds.append(("r8", rj))
                        b8.append(buf)
                    else:
                        buf = np.zeros(n, np.uint16)
                        buf[:m] = diff.astype(np.uint16)
                        kinds.append(("r16", rj))
                        b16.append(buf)
                    params[j] = (m, 0)
                    found = True
                    break
            if found:
                continue
        if mx < 65536:
            kinds.append(("u16",))
            b16.append(r.astype(np.uint16))
            continue
        # sparse-exception narrow planes (multiplicity tables)
        big16 = np.flatnonzero(r >= 65536)
        if big16.size and big16.size <= n // _EXC_FRAC:
            big8 = np.flatnonzero(r >= 256)
            if big8.size <= n // _EXC_FRAC:
                base = np.where(r < 256, r, 0).astype(np.uint8)
                kinds.append(("x8",))
                b8.append(base)
                exc_idx.extend((j * n + big8).tolist())
                exc_val.extend(r[big8].tolist())
            else:
                base = np.where(r < 65536, r, 0).astype(np.uint16)
                kinds.append(("x16",))
                b16.append(base)
                exc_idx.extend((j * n + big16).tolist())
                exc_val.extend(r[big16].tolist())
            continue
        kinds.append(("u32",))
        b32.append(r)

    def stack(lst, dt):
        return np.stack(lst) if lst else np.zeros((0, n), dt)

    E = len(exc_idx)
    if E:
        # pad the exception list to the next power of two with repeats of
        # the last entry (idempotent under scatter-set)
        Epad = 1 << (E - 1).bit_length()
        exc_idx = np.asarray(
            exc_idx + [exc_idx[-1]] * (Epad - E), np.int32
        )
        exc_val = np.asarray(
            [int(v) for v in exc_val] + [int(exc_val[-1])] * (Epad - E),
            np.uint32,
        )
    else:
        exc_idx = np.zeros(0, np.int32)
        exc_val = np.zeros(0, np.uint32)
    return tuple(kinds), (
        stack(b8, np.uint8),
        stack(b16, np.uint16),
        stack(b32, np.uint32),
        params,
        exc_idx,
        exc_val,
    )


@lru_cache(maxsize=None)
def _unpack(kinds, n: int, Epad: int):
    K = len(kinds)

    def f(b8, b16, b32, params, exc_idx, exc_val):
        iota = jax.lax.iota(jnp.uint32, n)
        rows = [None] * K
        i8 = i16 = i32 = 0
        deferred = []
        for j, kind in enumerate(kinds):
            k0 = kind[0]
            if k0 == "z":
                rows[j] = jnp.zeros(n, jnp.uint32)
            elif k0 == "c":
                c, m = params[j, 0], params[j, 1]
                rows[j] = jnp.where(iota < m, c, jnp.uint32(0))
            elif k0 in ("d8", "d16"):
                d = (b8[i8] if k0 == "d8" else b16[i16]).astype(jnp.uint32)
                if k0 == "d8":
                    i8 += 1
                else:
                    i16 += 1
                base, m = params[j, 0], params[j, 1]
                v = base + jnp.cumsum(d, dtype=jnp.uint32)
                rows[j] = jnp.where(iota < m, v, jnp.uint32(0))
            elif k0 in ("r8", "r16"):
                d = (b8[i8] if k0 == "r8" else b16[i16]).astype(jnp.uint32)
                if k0 == "r8":
                    i8 += 1
                else:
                    i16 += 1
                deferred.append((j, kind[1], d))
            elif k0 in ("u8", "x8"):
                rows[j] = b8[i8].astype(jnp.uint32)
                i8 += 1
            elif k0 in ("u16", "x16"):
                rows[j] = b16[i16].astype(jnp.uint32)
                i16 += 1
            else:  # u32
                rows[j] = b32[i32]
                i32 += 1
        for j, rj, d in deferred:
            m = params[j, 0]
            rows[j] = jnp.where(iota < m, rows[rj] - d, jnp.uint32(0))
        st = jnp.stack(rows)
        if Epad:
            st = st.reshape(-1).at[exc_idx].set(exc_val).reshape(K, n)
        return st

    return jax.jit(f)


def upload_stack(rows, m: int):
    """Pack rows on host, upload the planes, reconstruct (K, n) uint32 on
    device.  Bit-exact replacement for jnp.asarray(np.stack(rows))."""
    kinds, (b8, b16, b32, params, exc_idx, exc_val) = classify(rows, int(m))
    n = int(rows[0].shape[0])
    return _unpack(kinds, n, int(exc_idx.shape[0]))(
        jnp.asarray(b8),
        jnp.asarray(b16),
        jnp.asarray(b32),
        jnp.asarray(params),
        jnp.asarray(exc_idx),
        jnp.asarray(exc_val),
    )


def packed_bytes(rows, m: int) -> tuple[int, int]:
    """(raw bytes, packed upload bytes) — diagnostics/tests."""
    kinds, (b8, b16, b32, params, exc_idx, exc_val) = classify(rows, int(m))
    raw = sum(np.asarray(r).nbytes for r in rows)
    packed = (
        b8.nbytes + b16.nbytes + b32.nbytes + params.nbytes
        + exc_idx.nbytes + exc_val.nbytes
    )
    return raw, packed
