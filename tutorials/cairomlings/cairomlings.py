#!/usr/bin/env python
"""cairomlings — rustlings-style Cairo-M exercises.

Role of `tutorials/cairomlings` in the reference (exercise CLI over
00_intro … 07_loops).  Each exercise in `exercises/` carries:

    // I AM NOT DONE            the progress marker you delete when done
    // TEST: entry [args] want  the check the runner executes
    // HINT: ...                shown by `hint`

Usage (from the repo root):
    python tutorials/cairomlings/cairomlings.py list
    python tutorials/cairomlings/cairomlings.py run 01_variables
    python tutorials/cairomlings/cairomlings.py hint 01_variables
    python tutorials/cairomlings/cairomlings.py verify
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

EXDIR = os.path.join(HERE, "exercises")
NOT_DONE = "I AM NOT DONE"


def exercises():
    return sorted(
        f[:-3] for f in os.listdir(EXDIR) if f.endswith(".cm")
    )


def _load(name):
    path = os.path.join(EXDIR, name + ".cm")
    if not os.path.exists(path):
        print(f"no such exercise: {name}")
        sys.exit(2)
    return path, open(path).read()


def _test_spec(src):
    m = re.search(r"//\s*TEST:\s*(\w+)\s*(\[.*?\])\s*(\S+)", src)
    if not m:
        raise ValueError("exercise has no TEST line")
    return m.group(1), json.loads(m.group(2)), m.group(3)


def _check(name, quiet=False) -> bool:
    from cairo_m_tpu.compiler import CompilationError, compile_cairo
    from cairo_m_tpu.isa.abi_codec import InputValue
    from cairo_m_tpu.vm.runner import run_cairo_program

    path, src = _load(name)
    if NOT_DONE in src:
        if not quiet:
            print(f"{name}: still marked `{NOT_DONE}` — edit {path}")
        return False
    entry, args, want = _test_spec(src)
    try:
        out = compile_cairo(src, name=path)
    except CompilationError as e:
        if not quiet:
            print(f"{name}: does not compile\n{e.render()}")
        return False
    try:
        res = run_cairo_program(
            out.program, entry, [InputValue.number(a) for a in args]
        )
    except Exception as e:  # noqa: BLE001 - learner-facing harness
        if not quiet:
            print(f"{name}: run failed: {e}")
        return False
    got = res.return_values[0].flatten() if res.return_values else None
    if str(got) != want:
        if not quiet:
            print(f"{name}: {entry}({args}) = {got}, expected {want}")
        return False
    if not quiet:
        print(f"{name}: ok ✅")
    return True


def main(argv):
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd = argv[0]
    if cmd == "list":
        for name in exercises():
            _, src = _load(name)
            mark = "todo" if NOT_DONE in src else "done?"
            print(f"  {name:<20} {mark}")
        return 0
    if cmd == "hint":
        _, src = _load(argv[1])
        hints = re.findall(r"//\s*HINT:\s*(.*)", src)
        print("\n".join(hints) or "no hint for this one — you've got this")
        return 0
    if cmd == "run":
        return 0 if _check(argv[1]) else 1
    if cmd == "verify":
        for name in exercises():
            if not _check(name):
                print(f"\nkeep going — `{name}` is next.")
                return 1
        print("\nall exercises complete 🎉")
        return 0
    print(f"unknown command {cmd}")
    return 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
