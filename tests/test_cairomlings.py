"""The cairomlings exercise harness: every exercise must fail as shipped
(marker present) and pass once solved (solutions applied in-memory)."""

import importlib.util
import os
import re

import pytest

HERE = os.path.join(os.path.dirname(__file__), "..", "tutorials", "cairomlings")
spec = importlib.util.spec_from_file_location(
    "cairomlings", os.path.join(HERE, "cairomlings.py")
)
cairomlings = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cairomlings)

SOLUTIONS = {
    "00_intro": [("return 0; // fix me", "return 42;")],
    "01_variables": [("return z;", "let z = x * y;\n    return z;")],
    "02_functions": [
        (
            "// write a function `triple` and use it below",
            "fn triple(x: felt) -> felt { return 3 * x; }",
        )
    ],
    "03_types": [("return 0; // fix me", "return (b as felt) + 1;")],
    "04_structs": [("return 0; // fix me: width times height", "return r.w * r.h;")],
    "05_control_flow": [
        (
            "return 0; // handle b == 3 too",
            "if b == 3 { return b; }\n    return 0;",
        )
    ],
    "06_u32": [("return 0u32; // fix me", "return q * b + r;")],
    "07_loops": [
        (
            "// accumulate i into total",
            "total = total + i;",
        )
    ],
}


def test_exercise_list_complete():
    assert cairomlings.exercises() == sorted(SOLUTIONS)


@pytest.mark.parametrize("name", sorted(SOLUTIONS))
def test_exercise_fails_then_passes(name, tmp_path, monkeypatch):
    path, src = cairomlings._load(name)
    assert cairomlings.NOT_DONE in src, f"{name} shipped without the marker"
    # as shipped: not done
    assert not cairomlings._check(name, quiet=True)
    # solved: write a patched copy into a temp exercises dir
    solved = src.replace("// " + cairomlings.NOT_DONE, "")
    for old, new in SOLUTIONS[name]:
        assert old in solved, f"{name}: hook {old!r} missing"
        solved = solved.replace(old, new)
    exdir = tmp_path / "exercises"
    exdir.mkdir()
    (exdir / f"{name}.cm").write_text(solved)
    monkeypatch.setattr(cairomlings, "EXDIR", str(exdir))
    assert cairomlings._check(name, quiet=True), f"{name} solution fails"
