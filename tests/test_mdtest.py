"""Markdown-driven language conformance suite (reference mdtest/ +
crates/test_utils/src/mdtest): every ```cairo-m block under tests/mdtest/
is one test case, compiled and run against its //! expected / //! error
annotation."""

import os

import pytest

from cairo_m_tpu.testing.mdtest import discover, run_md_test

ROOT = os.path.join(os.path.dirname(__file__), "mdtest")
TESTS = discover(ROOT)


def _id(t):
    rel = os.path.relpath(t.path, ROOT).replace(".md", "")
    return f"{rel}::{t.name}"


@pytest.mark.parametrize("mdt", TESTS, ids=[_id(t) for t in TESTS])
def test_mdtest(mdt):
    if mdt.ignore is not None:
        pytest.skip(mdt.ignore)
    run_md_test(mdt)


def test_corpus_nonempty():
    assert len(TESTS) >= 50, f"only {len(TESTS)} mdtest cases discovered"
