"""The reference's two examples must stay runnable end-to-end."""

import runpy
import sys

import pytest


def run_example(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


def test_heat(capsys):
    run_example("examples/heat.py", ["6"])
    out = capsys.readouterr().out
    assert "gauss-seidel" in out and "converged=True" in out


def test_fill_in_reduction(capsys):
    run_example("examples/fill_in_reduction.py", ["50"])
    out = capsys.readouterr().out
    assert "LDL fill with" in out
    # orderings should not increase fill vs none by much; min-degree is
    # typically strictly better — assert ordering lines are present
    assert "min-degree" in out


def test_preconditioned_solve(capsys):
    run_example("examples/preconditioned_solve.py", ["12"])
    out = capsys.readouterr().out
    assert "ic0-pcg" in out and "ilu0" in out
    assert "converged=False" not in out


def test_supernodal_refactorization(capsys):
    run_example(
        "examples/supernodal_refactorization.py", ["16", "2"]
    )
    out = capsys.readouterr().out
    assert "supernodes=" in out
    assert "relative residual" in out  # asserts res < 1e-10 internally


def test_mixed_precision_refinement(capsys):
    run_example("examples/mixed_precision_refinement.py", ["24"])
    out = capsys.readouterr().out
    assert "backward error per refinement step" in out
    assert "f64-class backward error" in out  # asserts < 1e-12 internally


def test_batched_small_systems(capsys):
    run_example("examples/batched_small_systems.py", [])
    out = capsys.readouterr().out
    assert "OK" in out
