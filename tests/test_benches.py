"""Bit-rot guard for the scaling bench harness (VERDICT round-1 #10).

Real multi-chip hardware has never been available; the weak-scaling
target (>= 0.70 at N >= 2, BASELINE.md) can only be measured the moment
it appears.  To keep `benches/scaling_bench.py` one command away from
that measurement, this test executes its per-device-count benchmark
body on the virtual 8-device CPU mesh every round (tiny shapes, two
chained iterations) and checks the record schema the real run would
emit.  Timing values on the virtual mesh are meaningless and are only
checked for positivity.
"""

import importlib.util
import pathlib

import jax
import pytest

_BENCH = pathlib.Path(__file__).parent.parent / "benches" / "scaling_bench.py"


def _load_scaling_bench():
    spec = importlib.util.spec_from_file_location("scaling_bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_scaling_bench_dryrun(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    sb = _load_scaling_bench()
    rec = sb.bench_n(n_dev, rows_per=1024, iters=2)
    assert rec["n_devices"] == n_dev
    assert rec["rows"] >= 1024 * n_dev - 64  # side rounding
    assert rec["nnz"] > 0
    assert rec["halo_s"] > 0 and rec["gather_s"] > 0
    # halo schedule moves O(halo) bytes/device; gather moves O(n)
    assert rec["halo_bytes_per_dev"] >= 0
    if n_dev > 1:
        assert rec["gather_bytes_per_dev"] > rec["halo_bytes_per_dev"]
    comm = rec["spgemm_comm"]
    # bgather never moves more than the all-gather schedule
    assert comm["bgather_remote_blocks"] <= comm["allgather_remote_blocks"]
    assert comm["bgather_bytes_per_dev"] <= comm["allgather_bytes_per_dev"]
    assert 0.0 <= comm["comm_fraction"] <= 1.0


def test_bench_scripts_compile():
    """Every bench script must at least be syntactically valid — a
    syntax error in a battery stage otherwise burns a hardware window
    (round-2 lost one to an import error)."""
    import pathlib
    import py_compile

    root = pathlib.Path(__file__).resolve().parents[1]
    scripts = list((root / "benches").rglob("*.py"))
    assert len(scripts) > 10
    for p in scripts:
        py_compile.compile(str(p), doraise=True)
