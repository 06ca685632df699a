"""One-process TPU profiling session: claim the device once, then profile
prove_cairo_m phases at fib(100k) and fib(1M).  Writes progress to stdout.
"""
import os, sys, time, json

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("CM_DEBUG_PHASES", "1")

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

t00 = time.time()
def log(msg):
    print(f"[{time.time()-t00:8.1f}s] {msg}", flush=True)

log(f"devices: {jax.devices()}")
import jax.numpy as jnp
import numpy as np
np.asarray(jnp.zeros(8, jnp.uint32))
log("device claim done")

from cairo_m_tpu.compiler import compile_cairo
from cairo_m_tpu.prover.adapter.native_import import native_prover_input
from cairo_m_tpu.prover.config import REGULAR_96_BITS
from cairo_m_tpu.prover.prove import prove_cairo_m
from cairo_m_tpu.prover.verify import verify_cairo_m

SRC = """
fn main(n: felt) -> felt {
    let a = 0; let b = 1; let i = 0;
    while i != n { let t = a + b; a = b; b = t; i = i + 1; }
    return a;
}
"""
program = compile_cairo(SRC).program

for n_iters in (100_000, 1_000_000):
    t0 = time.time()
    pi = native_prover_input(program, "main", [n_iters])
    log(f"fib({n_iters}): adapter {time.time()-t0:.2f}s, steps={pi.total_steps}")
    for run in ("warm", "timed"):
        timing = {}
        t1 = time.time()
        proof = prove_cairo_m(pi, REGULAR_96_BITS, timing=timing)
        dt = time.time() - t1
        log(f"fib({n_iters}) {run} prove: {dt:.2f}s  "
            f"({pi.total_steps/dt:.0f} cycles/s)  phases="
            + json.dumps({k: round(v, 2) for k, v in timing.items()}))
    ok = verify_cairo_m(proof, REGULAR_96_BITS)
    log(f"fib({n_iters}) verified={ok}")
log("ALL DONE")
