"""ctypes bindings for the native VM + adapter core (vm_core.cpp).

`run_native(program, entrypoint, args)` executes and witness-prepares in
one native pass, returning a `ProverInput` ~100x faster than the Python
VM + adapter (the host-side bottleneck for 1M+-cycle traces).  Falls back
gracefully when the shared library is missing (`available()`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "libcm_vm.so")
    if not os.path.exists(path):
        src = os.path.join(os.path.dirname(__file__), "vm_core.cpp")
        os.system(f"g++ -O3 -march=native -shared -fPIC -std=c++17 -o {path} {src}")
    lib = ctypes.CDLL(path)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.cm_run.restype = ctypes.c_void_p
    lib.cm_run.argtypes = [
        u32p, ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32,
        u32p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64,
    ]
    lib.cm_run_resume.restype = ctypes.c_void_p
    lib.cm_run_resume.argtypes = [
        u32p, ctypes.c_uint64, u32p, ctypes.c_uint64, u32p, ctypes.c_uint64,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint64,
    ]
    for name in (
        "cm_bundles", "cm_final_mem", "cm_initial_extra", "cm_clock_updates",
        "cm_locals", "cm_heap", "cm_sparse",
    ):
        getattr(lib, name).restype = u32p
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in (
        "cm_bundles_len", "cm_final_mem_len", "cm_initial_extra_len",
        "cm_clock_updates_len", "cm_n_steps", "cm_locals_len", "cm_heap_len",
        "cm_sparse_len",
    ):
        getattr(lib, name).restype = ctypes.c_uint64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in ("cm_status", "cm_final_pc", "cm_final_fp"):
        getattr(lib, name).restype = (
            ctypes.c_int if name == "cm_status" else ctypes.c_uint32
        )
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.cm_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        return _load() is not None
    except OSError:
        return False


def _arr(lib, h, fn, n, copy):
    ptr = getattr(lib, fn)(h)
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    view = np.ctypeslib.as_array(ptr, shape=(n,))
    return view.copy() if copy else view


ERRORS = {
    -2: "uninitialized instruction cell",
    -3: "invalid opcode",
    -4: "division by zero",
    -5: "assertion failed",
    -6: "u32 limb out of range",
    -7: "memory error",
    -8: "out of memory",
}


def run_raw(program_words: np.ndarray, entry_pc: int, fp_offset: int,
            args: np.ndarray, ret_slots: int, max_steps: int,
            copy: bool = True):
    """-> dict of raw result arrays.  program_words: (n, 4) uint32.

    With copy=False the arrays are zero-copy views into native buffers —
    cheaper by a full touch of the bundle stream (the dominant cost on
    lazily-backed VMs) — and the caller MUST call out["free"]() when done
    with them (the native side pools the freed buffers for reuse)."""
    lib = _load()
    pw = np.ascontiguousarray(program_words, dtype=np.uint32)
    ar = np.ascontiguousarray(args, dtype=np.uint32)
    h = lib.cm_run(
        pw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(pw),
        entry_pc, fp_offset,
        ar.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(ar),
        ret_slots, max_steps,
    )
    return _collect(lib, h, copy)


def run_resume_raw(locals_: np.ndarray, heap: np.ndarray, sparse: np.ndarray,
                   pc: int, fp: int, final_pc: int, max_steps: int,
                   copy: bool = True):
    """Resume a continuation segment from a full memory image.

    locals_/heap: (n, 4) uint32 (heap index i = address MAX_ADDRESS - i);
    sparse: (m, 5) uint32 (addr, v0..v3) far-gap cells.  The image becomes
    the segment's clock-0 snapshot (see vm_core.cpp cm_run_resume)."""
    lib = _load()
    lo = np.ascontiguousarray(locals_, dtype=np.uint32)
    he = np.ascontiguousarray(heap, dtype=np.uint32)
    sp = np.ascontiguousarray(sparse, dtype=np.uint32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    h = lib.cm_run_resume(
        lo.ctypes.data_as(u32p), lo.shape[0] if lo.size else 0,
        he.ctypes.data_as(u32p), he.shape[0] if he.size else 0,
        sp.ctypes.data_as(u32p), sp.shape[0] if sp.size else 0,
        pc, fp, final_pc, max_steps,
    )
    return _collect(lib, h, copy)


def _collect(lib, h, copy):
    if not h:
        raise MemoryError("native VM: allocation failed (cm_run returned NULL)")
    try:
        status = lib.cm_status(h)
        if status != 0:
            raise RuntimeError(f"native VM error: {ERRORS.get(status, status)}")
        out = {
            "n_steps": lib.cm_n_steps(h),
            "final_pc": lib.cm_final_pc(h),
            "final_fp": lib.cm_final_fp(h),
            "bundles": _arr(lib, h, "cm_bundles", lib.cm_bundles_len(h), copy),
            "final_mem": _arr(
                lib, h, "cm_final_mem", lib.cm_final_mem_len(h), copy
            ),
            "initial_extra": _arr(
                lib, h, "cm_initial_extra", lib.cm_initial_extra_len(h), copy
            ),
            "clock_updates": _arr(
                lib, h, "cm_clock_updates", lib.cm_clock_updates_len(h), copy
            ),
            "locals": _arr(lib, h, "cm_locals", lib.cm_locals_len(h) * 4, copy),
            "heap": _arr(lib, h, "cm_heap", lib.cm_heap_len(h) * 4, copy),
            "sparse": _arr(lib, h, "cm_sparse", lib.cm_sparse_len(h), copy),
        }
        out["locals"] = out["locals"].reshape(-1, 4)
        out["heap"] = out["heap"].reshape(-1, 4)
        out["sparse"] = out["sparse"].reshape(-1, 5)
    except Exception:
        lib.cm_free(h)
        raise
    if copy:
        lib.cm_free(h)
        out["free"] = lambda: None
    else:
        freed = []
        def _free(h=h, lib=lib):
            if not freed:
                freed.append(True)
                lib.cm_free(h)
        out["free"] = _free
    return out
