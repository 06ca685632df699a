"""Persistent TPU job server for interactive perf work.

The axon TPU tunnel charges a ~500 s device-claim handshake per PROCESS
(documented in bench.py).  Paying it once and iterating inside one live
process is the only sane way to profile: this server claims the device,
then polls ``/tmp/tpu_jobs/*.py`` and exec()s each job file in a shared
namespace (so device arrays / jit caches persist across jobs), writing
stdout+traceback to ``<job>.out`` and touching ``<job>.done``.

Usage:
    python scripts/tpu_server.py &          # once
    cat > /tmp/tpu_jobs/001.py <<EOF        # per experiment
    print(jax.devices())
    EOF
    # wait for /tmp/tpu_jobs/001.py.done, read 001.py.out

Not part of the framework; a development tool only.
"""

import faulthandler
import os
import signal
import sys
import time
import traceback

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_tpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

t0 = time.time()
print("claiming device...", flush=True)
import jax.numpy as jnp

jnp.zeros(8).block_until_ready()
print(f"claimed in {time.time()-t0:.1f}s: {jax.devices()}", flush=True)

ns = {"jax": jax, "jnp": jnp, "os": os, "sys": sys, "time": time}

while True:
    jobs = sorted(
        f for f in os.listdir(JOBS)
        if f.endswith(".py") and not os.path.exists(os.path.join(JOBS, f + ".done"))
    )
    for j in jobs:
        path = os.path.join(JOBS, j)
        # stream stdout straight to the .out file so progress is visible
        # while the job runs (line-buffered)
        out = open(path + ".out", "w", buffering=1)
        old = sys.stdout
        sys.stdout = out
        try:
            code = open(path).read()
            exec(compile(code, path, "exec"), ns)
        except BaseException:
            traceback.print_exc(file=out)
        finally:
            sys.stdout = old
            out.close()
        with open(path + ".done", "w") as f:
            f.write("")
        print(f"job {j} done", flush=True)
    time.sleep(0.5)
