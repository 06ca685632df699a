"""Multi-process continuation-segment distribution — the "segments over
hosts" parallel axis (SURVEY.md §2.10; reference continuation semantics
`crates/runner/src/vm/mod.rs:177-227`, chained proofs
`crates/prover/tests/prover.rs:204-243`).

The reference has no distributed backend; this framework distributes the
*time* axis across processes/hosts: every worker re-runs the (cheap,
deterministic) VM+adapter to its assigned segments and proves segments
``proc_id, proc_id + N, ...`` independently — segment proofs share no
state, so the only cross-host communication is the final collection, and
scaling is embarrassing by construction.  On real fleets each worker is
one host of a pod (DCN); here the hermetic test runs N local CPU
processes.  Workers can optionally form one `jax.distributed` job
(``use_jax_distributed=True``) — useful once per-segment proving is itself
sharded across a worker's devices — but default to independent processes:
segment proving uses no cross-process collectives, and the coordination
service's shutdown barrier makes uneven worker finish times a liveness
hazard for no computational benefit.

Chain integrity: the coordinator asserts
``final_root(k) == initial_root(k+1)`` across segment boundaries and
verifies every proof.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def _worker_main(argv):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-procs", type=int, required=True)
    ap.add_argument("--proc-id", type=int, required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--jax-distributed", action="store_true")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # match the test environment's device topology (tests/conftest.py) so
    # workers hit the same persistent compile cache entries
    jax.config.update("jax_num_cpu_devices", 8)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_enable_x64", True)
    if args.jax_distributed:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_procs,
            process_id=args.proc_id,
        )
    spec = json.load(open(os.path.join(args.workdir, "job.json")))
    if spec.get("test_scale"):
        from ..prover.config import set_test_scale

        set_test_scale(**spec["test_scale"])
    from ..compiler import compile_cairo
    from ..prover.adapter.native_import import native_segment_prover_inputs
    from ..prover.config import REGULAR_96_BITS, test_config
    from ..prover.prove import prove_cairo_m
    from ..prover.verify import verify_cairo_m

    cfg = (
        test_config(**spec["test_config"])
        if spec.get("test_config")
        else REGULAR_96_BITS
    )
    program = compile_cairo(spec["source"]).program
    out = []
    for k, pi in enumerate(
        native_segment_prover_inputs(
            program, spec["entrypoint"], spec["args"], spec["max_steps"]
        )
    ):
        if k % args.num_procs != args.proc_id:
            continue
        proof = prove_cairo_m(pi, cfg)
        if not verify_cairo_m(proof, cfg):
            raise RuntimeError(f"segment {k}: proof failed verification")
        out.append(
            {
                "segment": k,
                "initial_root": pi.merkle_trees.initial_root,
                "final_root": pi.merkle_trees.final_root,
                "n_steps": pi.total_steps,
                "proof": proof.to_json_obj(),
            }
        )
    with open(os.path.join(args.workdir, f"proofs_{args.proc_id}.json"), "w") as f:
        json.dump(out, f)
    if args.jax_distributed:
        # synchronize before interpreter exit: jax.distributed runs a
        # shutdown barrier at atexit, and workers finish at different
        # times — without this sync the fast worker's barrier times out
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("segments_done")


def prove_segments_multiprocess(
    source: str,
    entrypoint: str,
    args: list,
    max_steps: int,
    n_processes: int = 2,
    test_scale: dict = None,
    test_config: dict = None,
    timeout: int = 900,
    use_jax_distributed: bool = False,
):
    """Launch N worker processes (one jax.distributed job), round-robin the
    continuation segments across them, collect the proofs, assert the
    Poseidon2 root chain, and return the ordered per-segment records."""
    workdir = tempfile.mkdtemp(prefix="cm_segments_")
    # bind an ephemeral port for the coordinator: pid-derived ports collide
    # across concurrent jobs / pid reuse (ADVICE r4 #5)
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    with open(os.path.join(workdir, "job.json"), "w") as f:
        json.dump(
            {
                "source": source,
                "entrypoint": entrypoint,
                "args": args,
                "max_steps": max_steps,
                "test_scale": test_scale,
                "test_config": test_config,
            },
            f,
        )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "cairo_m_tpu.parallel.segments",
                "--coordinator", f"localhost:{port}",
                "--num-procs", str(n_processes),
                "--proc-id", str(i),
                "--workdir", workdir,
            ]
            + (["--jax-distributed"] if use_jax_distributed else []),
            env=env,
            cwd=repo,
        )
        for i in range(n_processes)
    ]
    for p in procs:
        rc = p.wait(timeout=timeout)
        if rc != 0:
            raise RuntimeError(f"segment worker exited with {rc}")
    records = []
    for i in range(n_processes):
        records += json.load(open(os.path.join(workdir, f"proofs_{i}.json")))
    records.sort(key=lambda r: r["segment"])
    # explicit raises, not asserts: these are the chain-integrity contract
    # and must survive `python -O` (ADVICE r4 #5)
    if [r["segment"] for r in records] != list(range(len(records))):
        raise RuntimeError(
            "segment set incomplete or duplicated: "
            f"{[r['segment'] for r in records]}"
        )
    for a, b in zip(records, records[1:]):
        if a["final_root"] != b["initial_root"]:
            raise RuntimeError(
                f"segment root chain broken between {a['segment']} and "
                f"{b['segment']}"
            )
    return records


if __name__ == "__main__":
    _worker_main(sys.argv[1:])
