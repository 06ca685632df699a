"""Benchmark: prove fibonacci_loop end to end, report cycles proved/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol: compile fibonacci_loop.cm -> run the VM -> adapter -> prove with
the production 96-bit config -> verify.  The first prove warms the jit
caches (XLA compiles are persistent-cached under /tmp/jax_cache); the
second is timed.

vs_baseline: the reference publishes no absolute numbers and cannot run
here (no Rust toolchain — BASELINE.md); the ratio is against the
documented working assumption of 1e5 cycles/s for the reference CPU
prover on this workload (prover_speed_benchmark.rs harness).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ITERS = int(os.environ.get("BENCH_FIB_ITERS", "2000"))
BASELINE_CYCLES_PER_SEC = 1e5


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cairo_m_tpu.compiler import compile_cairo
    from cairo_m_tpu.isa.abi_codec import InputValue
    from cairo_m_tpu.prover.adapter.adapter import import_from_runner_output
    from cairo_m_tpu.prover.config import REGULAR_96_BITS
    from cairo_m_tpu.prover.prove import prove_cairo_m
    from cairo_m_tpu.prover.verify import verify_cairo_m
    from cairo_m_tpu.vm.runner import run_cairo_program

    src = """
fn main(n: felt) -> felt {
    let a = 0;
    let b = 1;
    let i = 0;
    while i != n {
        let t = a + b;
        a = b;
        b = t;
        i = i + 1;
    }
    return a;
}
"""
    t0 = time.time()
    program = compile_cairo(src).program
    res = run_cairo_program(program, "main", [InputValue.number(N_ITERS)])
    n_cycles = len(res.vm.segments[0].trace) - 1
    t_vm = time.time() - t0

    pi = import_from_runner_output(res.vm.segments[0], res.public_address_ranges)
    t_adapter = time.time() - t0 - t_vm

    # warm-up prove (compiles all kernels for this shape set)
    timing = {}
    proof = prove_cairo_m(pi, REGULAR_96_BITS, timing=timing)
    warm = dict(timing)

    # timed prove
    timing = {}
    t1 = time.time()
    proof = prove_cairo_m(pi, REGULAR_96_BITS, timing=timing)
    prove_s = time.time() - t1

    ok = verify_cairo_m(proof, REGULAR_96_BITS)

    value = n_cycles / prove_s
    out = {
        "metric": "fibonacci_cycles_proved_per_sec",
        "value": round(value, 2),
        "unit": "cycles/s",
        "vs_baseline": round(value / BASELINE_CYCLES_PER_SEC, 4),
        "detail": {
            "n_cycles": n_cycles,
            "prove_s": round(prove_s, 3),
            "vm_s": round(t_vm, 3),
            "adapter_s": round(t_adapter, 3),
            "warmup_s": round(warm.get("total", 0), 3),
            "verified": bool(ok),
            "phases": {k: round(v, 3) for k, v in timing.items()},
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
