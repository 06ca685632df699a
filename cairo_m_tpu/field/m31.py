"""M31 (Mersenne-31, p = 2^31 - 1) field arithmetic, TPU-native.

The base field of the Cairo-M zkVM and its circle-STARK prover
(reference: stwo `core::fields::m31`, consumed throughout
`/root/reference/crates` — see SURVEY.md §2.9).

Two implementations, cross-tested against each other:

- ``*_np`` host path: NumPy ``uint64`` intermediate products (fast on CPU,
  used by the VM / adapter / golden vectors).
- jax path (the default exported ops): pure ``uint32`` arithmetic using
  16-bit limb decomposition for products, because the TPU VPU has no 64-bit
  integer datapath.  All ops are shape-polymorphic, elementwise, and safe to
  use inside ``jit``, ``shard_map`` and Pallas kernels.

Canonical representation: values in ``[0, P)`` (p itself is never stored).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

P = (1 << 31) - 1  # 2147483647
P_U32 = np.uint32(P)

# ---------------------------------------------------------------------------
# Host (NumPy, uint64 intermediates) path
# ---------------------------------------------------------------------------


def add_np(a, b):
    s = a.astype(np.uint64) + b.astype(np.uint64)
    s = np.where(s >= P, s - P, s)
    return s.astype(np.uint32)


def sub_np(a, b):
    a = a.astype(np.uint64)
    b = b.astype(np.uint64)
    return np.where(a >= b, a - b, a + P - b).astype(np.uint32)


def neg_np(a):
    return np.where(a == 0, np.uint32(0), P_U32 - a.astype(np.uint32))


def mul_np(a, b):
    p = a.astype(np.uint64) * b.astype(np.uint64)
    # p < 2^62; fold twice: x mod (2^31-1) via lo+hi
    p = (p & P) + (p >> 31)
    p = (p & P) + (p >> 31)
    return np.where(p == P, 0, p).astype(np.uint32)


def pow_np(a, e: int):
    a = np.asarray(a, dtype=np.uint32)
    result = np.full_like(a, 1, dtype=np.uint32)
    base = a
    while e > 0:
        if e & 1:
            result = mul_np(result, base)
        base = mul_np(base, base)
        e >>= 1
    return result


def inv_np(a):
    """Inverse by Fermat: a^(p-2).  a==0 maps to 0 (caller's responsibility)."""
    return pow_np(a, P - 2)


def batch_inv_np(a):
    """Montgomery batch inversion on the host (single field pow amortized)."""
    a = np.asarray(a, dtype=np.uint32)
    flat = a.reshape(-1)
    n = flat.shape[0]
    if n == 0:
        return a
    prefix = np.empty(n, dtype=np.uint32)
    acc = np.uint32(1)
    safe = np.where(flat == 0, np.uint32(1), flat)
    for i in range(n):
        prefix[i] = acc
        acc = mul_np(acc, safe[i])
    inv_acc = inv_np(np.asarray(acc))
    out = np.empty(n, dtype=np.uint32)
    for i in range(n - 1, -1, -1):
        out[i] = mul_np(inv_acc, prefix[i])
        inv_acc = mul_np(inv_acc, safe[i])
    return np.where(flat == 0, 0, out).reshape(a.shape).astype(np.uint32)


# ---------------------------------------------------------------------------
# Device (jax, uint32-only) path
# ---------------------------------------------------------------------------

MASK16 = np.uint32(0xFFFF)
MASK15 = np.uint32(0x7FFF)


def add(a, b):
    """a + b mod p, for canonical a, b in [0, p)."""
    s = a + b  # < 2^32, no overflow
    return jnp.where(s >= P_U32, s - P_U32, s)


def sub(a, b):
    return jnp.where(a >= b, a - b, a + (P_U32 - b))


def neg(a):
    return jnp.where(a == 0, jnp.uint32(0), P_U32 - a)


def double(a):
    return add(a, a)


def _reduce_partial(s):
    """Reduce s in [0, 2^32) to [0, p): fold bit 31, then canonicalize."""
    s = (s & P_U32) + (s >> 31)  # <= p + 1
    return jnp.where(s >= P_U32, s - P_U32, s)


def mul(a, b):
    """a * b mod p.

    On 64-bit-enabled backends (CPU tests/dev: ``jax_enable_x64``) uses a
    single uint64 product + Mersenne fold (~7 primitives).  Otherwise uses
    16-bit limb products (uint32-only; TPU-safe).

    a = a0 + a1*2^16 (a0 < 2^16, a1 < 2^15), likewise b.
    product = lo + mid*2^16 + hi*2^32 with
      lo  = a0*b0          < 2^32
      mid = a0*b1 + a1*b0  < 2^32
      hi  = a1*b1          < 2^30
    mod p: 2^31 = 1, 2^32 = 2, so
      product = (lo mod 2^31) + (lo >> 31)
              + (mid & 0x7fff)*2^16 + (mid >> 15)
              + 2*hi
    summed with modular adds (every term < p+1 <= 2^31).
    """
    a = a.astype(jnp.uint32) if hasattr(a, "astype") else jnp.uint32(a)
    b = b.astype(jnp.uint32) if hasattr(b, "astype") else jnp.uint32(b)
    if jax.config.jax_enable_x64:
        p64 = a.astype(jnp.uint64) * b.astype(jnp.uint64)
        p64 = (p64 & jnp.uint64(P)) + (p64 >> 31)
        p64 = (p64 & jnp.uint64(P)) + (p64 >> 31)
        return jnp.where(p64 == P, 0, p64).astype(jnp.uint32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    lo = a0 * b0
    mid = a0 * b1 + a1 * b0  # < 2^31 + 2^31 = 2^32: ok in uint32
    hi = a1 * b1
    t0 = _reduce_partial(lo)
    t1 = _reduce_partial((mid & MASK15) << 16)
    t2 = mid >> 15  # < 2^17, already < p
    t3 = _reduce_partial(hi << 1)  # 2*hi < 2^31
    r = add(t0, t1)
    r = add(r, t2)
    r = add(r, t3)
    return r


def mul_const(a, c: int):
    """Multiply by a small compile-time constant via the same limb path."""
    return mul(a, jnp.uint32(c % P))


def pow_scalar(a, e: int):
    """a**e for a static integer exponent (unrolled square-and-multiply)."""
    result = jnp.ones_like(a)
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(a):
    """a^(p-2) via an addition-chain (~37 muls instead of 60).

    p - 2 = 2^31 - 3 = (2^29 - 1)*4 + 1, built from t_k = a^(2^k - 1) blocks.
    """
    t1 = a  # 2^1-1
    t2 = mul(_sq_n(t1, 1), t1)  # 2^2-1
    t3 = mul(_sq_n(t2, 1), t1)  # 2^3-1
    t5 = mul(_sq_n(t3, 2), t2)  # 2^5-1
    t6 = mul(_sq_n(t3, 3), t3)  # 2^6-1
    t12 = mul(_sq_n(t6, 6), t6)  # 2^12-1
    t24 = mul(_sq_n(t12, 12), t12)  # 2^24-1
    t29 = mul(_sq_n(t24, 5), t5)  # 2^29-1
    return mul(_sq_n(t29, 2), a)  # (2^29-1)*4 + 1 = 2^31-3


def _sq_n(x, n: int):
    for _ in range(n):
        x = mul(x, x)
    return x


def batch_inv(a, axis=None):
    """Vectorized inversion.  On device a plain powering is faster than a
    sequential Montgomery chain (which would serialize); XLA computes the
    37-mul chain elementwise in parallel."""
    return inv(a)


def sum_mod(a, axis=0):
    """Modular sum along an axis via pairwise tree reduction (uint32-safe)."""
    import jax.numpy as jnp

    n = a.shape[axis]
    while n > 1:
        half = n // 2
        a0 = jnp.take(a, jnp.arange(0, 2 * half, 2), axis=axis)
        a1 = jnp.take(a, jnp.arange(1, 2 * half, 2), axis=axis)
        s_ = add(a0, a1)
        if n % 2:
            tail = jnp.take(a, jnp.arange(n - 1, n), axis=axis)
            s_ = jnp.concatenate([s_, tail], axis=axis)
        a = s_
        n = a.shape[axis]
    return jnp.squeeze(a, axis=axis)


def from_i64(x):
    """Reduce a (possibly negative) Python/NumPy integer array to canonical M31."""
    x = np.asarray(x, dtype=np.int64) % P
    return x.astype(np.uint32)


def to_jax(a):
    return jnp.asarray(np.asarray(a, dtype=np.uint32))
