"""Benchmark: prove fibonacci_loop end to end, report cycles proved/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol: compile fibonacci_loop.cm -> run the VM -> adapter -> prove with
the production 96-bit config -> verify.  The first prove warms the jit
caches (XLA compiles are persistent-cached under .jax_cache); the second
is timed.

Two robustness measures against the harness timeout (the axon TPU tunnel
charges a one-time ~8-minute device-claim handshake on the FIRST
device-to-host transfer of each process — measured 490 s for an 8-byte
pull, ~0.03-0.4 s per pull afterwards):

- a daemon thread fires a tiny D2H at t=0 so the claim overlaps the host
  work (compile, VM run, adapter, jit warmup);
- SIGTERM/SIGINT print the best measurement recorded so far as the JSON
  line before exiting, so a timeout still yields a parsed datapoint.

vs_baseline: the reference publishes no absolute numbers and cannot run
here (no Rust toolchain — BASELINE.md); the ratio is against the
documented working assumption of 1e5 cycles/s for the reference CPU
prover on this workload (prover_speed_benchmark.rs harness).
"""

import json
import os
import signal
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_ITERS = int(os.environ.get("BENCH_FIB_ITERS", "2000"))
BASELINE_CYCLES_PER_SEC = 1e5

_state = {
    "metric": "fibonacci_cycles_proved_per_sec",
    "value": 0.0,
    "unit": "cycles/s",
    "vs_baseline": 0.0,
    "detail": {"stage": "startup"},
}


def _emit_and_exit(signum=None, frame=None):
    print(json.dumps(_state), flush=True)
    os._exit(0)


def _record(value, n_cycles, prove_s, stage, **extra):
    _state["value"] = round(value, 2)
    _state["vs_baseline"] = round(value / BASELINE_CYCLES_PER_SEC, 4)
    _state["detail"] = {
        "stage": stage,
        "n_cycles": n_cycles,
        "prove_s": round(prove_s, 3),
        **extra,
    }


def main():
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # Fire the device-claim handshake immediately; everything below overlaps.
    def _claim():
        import numpy as _np
        import jax.numpy as _jnp

        _np.asarray(_jnp.zeros(8, _jnp.uint32))
        _state["detail"]["claim_done_s"] = round(time.time() - t_start, 1)

    t_start = time.time()
    threading.Thread(target=_claim, daemon=True).start()

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
    _state["detail"]["stage"] = "vm_done"

    pi = import_from_runner_output(res.vm.segments[0], res.public_address_ranges)
    t_adapter = time.time() - t0 - t_vm
    _state["detail"]["stage"] = "adapter_done"

    # warm-up prove (compiles all kernels for this shape set; its wall time
    # also absorbs the device-claim stall)
    timing = {}
    t1 = time.time()
    prove_cairo_m(pi, REGULAR_96_BITS, timing=timing)
    warm_s = time.time() - t1
    _record(n_cycles / warm_s, n_cycles, warm_s, "warm_prove_done",
            note="warm-run rate (includes jit compiles + device claim)")

    # timed prove
    timing = {}
    t1 = time.time()
    proof = prove_cairo_m(pi, REGULAR_96_BITS, timing=timing)
    prove_s = time.time() - t1
    value = n_cycles / prove_s
    _record(value, n_cycles, prove_s, "timed_prove_done",
            vm_s=round(t_vm, 3), adapter_s=round(t_adapter, 3),
            warmup_s=round(warm_s, 3),
            phases={k: round(v, 3) for k, v in timing.items()},
            device=str(jax.devices()[0]))

    ok = verify_cairo_m(proof, REGULAR_96_BITS)
    _state["detail"]["verified"] = bool(ok)
    _state["detail"]["stage"] = "done"
    print(json.dumps(_state), flush=True)


if __name__ == "__main__":
    main()
