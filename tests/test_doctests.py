"""Executable docstring examples (reference discipline: doctests
throughout, e.g. /root/reference/sprs/src/sparse/csmat.rs:195-206,
bicgstab.rs:27-68).  Curated module list — docstrings here are API
contracts, run on every suite pass."""

import doctest

import pytest

MODULES = [
    "sprs_tpu",
    "sprs_tpu.formats.csmat",
    "sprs_tpu.linalg.bicgstab",
    "sprs_tpu.linalg.trisolve",
    "sprs_tpu.linalg.ldl",
    "sprs_tpu.ops.kron",
    "sprs_tpu.ops.spgemm",
    "sprs_tpu.linalg.refine",
    "sprs_tpu.ops.batch",
]


@pytest.mark.parametrize("modname", MODULES)
def test_doctests(modname):
    import importlib

    mod = importlib.import_module(modname)
    results = doctest.testmod(
        mod,
        optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS,
        verbose=False,
    )
    assert results.failed == 0, f"{results.failed} doctest failures in {modname}"
    assert results.attempted > 0, f"no doctests collected from {modname}"
