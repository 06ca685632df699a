"""North-star continuation workload: fibonacci at 10M+ cycles, proved as
chained segments (BASELINE.md config #5; reference
`crates/prover/tests/prover.rs:144-172,204-243`).

Runs fibonacci_loop for SEG_FIB_ITERS iterations (default 1,250,000 ->
10,000,010 cycles), segments the execution at the production cap
(2^20 - 1 steps) through the native core's resume path, proves every
segment with the production 96-bit config, asserts the Poseidon2 root
chain `final_root(k) == initial_root(k+1)`, verifies every proof, and
prints ONE JSON line:

  {"metric": "fib10m_cycles_proved_per_sec", "value": ..., "unit":
   "cycles/s", "segments": N, ...}

Usage:  python scripts/bench_segments.py          (TPU via axon, or CPU)
        SEG_FIB_ITERS=2000 SEG_MAX_STEPS=4000 python scripts/bench_segments.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ITERS = int(os.environ.get("SEG_FIB_ITERS", "1250000"))
MAX_STEPS = int(os.environ.get("SEG_MAX_STEPS", str((1 << 20) - 1)))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cairo_m_tpu.compiler import compile_cairo
    from cairo_m_tpu.prover.adapter.native_import import (
        native_segment_prover_inputs,
    )
    from cairo_m_tpu.prover.config import REGULAR_96_BITS
    from cairo_m_tpu.prover.prove import prove_cairo_m
    from cairo_m_tpu.prover.verify import verify_cairo_m

    src = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""
    t0 = time.time()
    program = compile_cairo(src).program
    total_cycles = 0
    n_segments = 0
    prove_s = 0.0
    adapter_s = 0.0
    seg_times = []  # (cycles, prove seconds) per segment
    prev_final_root = None
    all_verified = True
    t_seg = time.time()
    for pi in native_segment_prover_inputs(program, "main", [N_ITERS], MAX_STEPS):
        adapter_s += time.time() - t_seg
        if prev_final_root is not None:
            assert pi.merkle_trees.initial_root == prev_final_root, (
                "segment root chain broken"
            )
        prev_final_root = pi.merkle_trees.final_root
        t1 = time.time()
        proof = prove_cairo_m(pi, REGULAR_96_BITS)
        dt = time.time() - t1
        prove_s += dt
        seg_times.append((pi.total_steps, round(dt, 2)))
        all_verified &= bool(verify_cairo_m(proof, REGULAR_96_BITS))
        total_cycles += pi.total_steps
        n_segments += 1
        print(
            f"  segment {n_segments}: {pi.total_steps} cycles, "
            f"prove {dt:.2f}s, chain ok",
            file=sys.stderr, flush=True,
        )
        t_seg = time.time()
    value = total_cycles / prove_s if prove_s else 0.0
    # warm rate: segments after the first (segment 1 absorbs this
    # process's jit warmup — the sustained per-segment throughput is the
    # scaling-relevant number, mirroring bench.py's warmup/timed split)
    warm = seg_times[1:]
    warm_cycles = sum(c for c, _ in warm)
    warm_s = sum(t for _, t in warm)
    print(json.dumps({
        "metric": "fib10m_cycles_proved_per_sec",
        "value": round(value, 2),
        "unit": "cycles/s",
        "segments": n_segments,
        "total_cycles": total_cycles,
        "prove_s": round(prove_s, 2),
        "adapter_s": round(adapter_s, 2),
        "warm_value": round(warm_cycles / warm_s, 2) if warm_s else 0.0,
        "warm_segments": len(warm),
        "per_segment": seg_times,
        "root_chain_ok": True,
        "all_verified": all_verified,
        "wall_s": round(time.time() - t0, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
