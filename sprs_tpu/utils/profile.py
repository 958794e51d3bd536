"""Kernel timing and roofline audit.

The reference ships no profiling beyond ``std::time::Instant`` in its
benches (sprs-benches/src/main.rs:205-221).  A TPU framework needs more:
every hot kernel should report its achieved fraction of the
HBM-bandwidth roofline (BASELINE.md target: >= 80%).  This module
provides

* :func:`chain_time` — honest wall-clock of a chained ``y = f(y)`` loop.
  Timing ends with a device->host scalar fetch, not
  ``block_until_ready``: through the axon TPU tunnel the latter
  sometimes acks before execution finishes, producing impossible
  numbers (measured: 25 TB/s "copy bandwidth").
* :func:`measure_peak_bandwidth` — achievable streaming bandwidth via a
  saturating a*x+b kernel, the denominator of every roofline fraction.
* byte-accounting helpers per format (speed-of-light HBM traffic of one
  SpMV), and :func:`roofline_report` tying them together.
* :func:`trace` — context manager around ``jax.profiler`` for deep dives
  (writes a TensorBoard trace directory).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def fetch_scalar(y) -> float:
    """Force completion by reading ONE device scalar.

    The index happens on device; only 4 bytes cross the tunnel.  A
    host-side ``np.asarray(y)[0]`` would transfer the whole array
    inside the timed window and inflate every measurement."""
    leaf = jax.tree_util.tree_leaves(y)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


_fetch_scalar = fetch_scalar  # backward-compat alias


def chain_time(step: Callable, x0, iters: int = 50) -> float:
    """Per-iteration seconds of y = step(y), fetch-terminated."""
    y = step(x0)
    _ = _fetch_scalar(y)  # compile + settle
    t0 = time.perf_counter()
    y = x0
    for _ in range(iters):
        y = step(y)
    _ = _fetch_scalar(y)
    return (time.perf_counter() - t0) / iters


def chain_time_best(
    step: Callable, x0, iters: int = 10, rounds: int = 3
) -> float:
    """min over ``rounds`` of :func:`chain_time` — the benchmark form
    (tunnel speed drifts; the best round is the stable statistic)."""
    y = step(x0)
    _ = _fetch_scalar(y)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        y = x0
        for _ in range(iters):
            y = step(y)
        _ = _fetch_scalar(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def fori_chain_time(
    step2: Callable,
    operand,
    x0,
    inner: int = 32,
    rounds: int = 3,
) -> float:
    """Per-iteration seconds with ``inner`` chained steps fused into ONE
    dispatch via ``lax.fori_loop``.

    Host-side chains (:func:`chain_time`) pay the tunnel's per-DISPATCH
    latency once per iteration, which swamps sub-millisecond kernels.
    Fusing the chain inside a single jitted ``fori_loop`` amortizes that
    floor over ``inner`` kernel executions and measures true device
    time.  ``step2(operand, y) -> y`` must be shape-preserving in ``y``;
    ``operand`` (e.g. the matrix pytree) is passed as an ARGUMENT — never
    close over large arrays (they embed as HLO constants and balloon the
    remote compile payload)."""

    @jax.jit
    def run(m, x):
        return jax.lax.fori_loop(0, inner, lambda i, y: step2(m, y), x)

    y = run(operand, x0)
    _ = _fetch_scalar(y)  # compile + settle
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        y = run(operand, x0)
        _ = _fetch_scalar(y)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def measure_peak_bandwidth(nbytes: int = 1 << 29, iters: int = 30) -> float:
    """Achievable streaming GB/s of a fused a*x+b over ``nbytes``."""
    n = nbytes // 4
    x = jnp.asarray(np.random.default_rng(3).random(n, dtype=np.float32))
    step = jax.jit(lambda x: x * 1.000001 + 0.5)
    dt = chain_time(step, x, iters)
    return 2.0 * nbytes / dt / 1e9


# ---------------------------------------------------------------------------
# speed-of-light byte accounting per format (one SpMV, each byte once)
# ---------------------------------------------------------------------------


def csr_spmv_bytes(nnz: int, rows: int, val_bytes: int = 4, idx_bytes: int = 4) -> int:
    """data + indices streamed once, one x gather per nnz, y + indptr."""
    return nnz * (2 * val_bytes + idx_bytes) + rows * (val_bytes + idx_bytes)


def ell_spmv_bytes(rows_pad: int, width: int, cols: int, val_bytes: int = 4) -> int:
    return rows_pad * width * (val_bytes + 4) + (cols + rows_pad) * val_bytes


def dia_spmv_bytes(n_diags: int, rows: int, cols: int, val_bytes: int = 4) -> int:
    return (n_diags * rows + cols + rows) * val_bytes


def bsr_spmm_bytes(n_blocks: int, bs: int, k: int, n_block_rows: int, val_bytes: int = 4) -> int:
    return (
        n_blocks * bs * (bs + k) + n_block_rows * bs * k
    ) * val_bytes


def roofline_report(
    name: str,
    seconds: float,
    useful_bytes: int,
    flops: int = 0,
    peak_gbps: float = None,
) -> Dict:
    """Assemble a roofline record for one kernel measurement."""
    if peak_gbps is None:
        peak_gbps = measure_peak_bandwidth()
    achieved = useful_bytes / seconds / 1e9
    return {
        "kernel": name,
        "seconds": seconds,
        "achieved_GBps": round(achieved, 2),
        "peak_GBps": round(peak_gbps, 2),
        "roofline_fraction": round(achieved / peak_gbps, 4),
        "gflops": round(flops / seconds / 1e9, 3) if flops else None,
        "backend": jax.default_backend(),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sprs_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def audit_spmv(mat, x=None, iters: int = 50) -> Dict:
    """End-to-end roofline audit of the best SpMV path for ``mat``.

    Picks DIA when the matrix is banded (few diagonals), else the ELL
    XLA path, mirroring the format-dispatch guidance in formats/.
    """
    from ..formats.dia import n_diags_of
    from ..formats.ell import ell_overhead, ell_spmv

    n = mat.shape[1]
    if x is None:
        x = jnp.asarray(
            np.random.default_rng(0).random(n, dtype=np.float32)
        )
    peak = measure_peak_bandwidth()
    k = n_diags_of(mat)
    if k <= 32:
        from ..ops.pallas import dia_spmv_pallas

        dia = mat.to_dia()
        dt = chain_time(
            jax.jit(lambda v: dia_spmv_pallas(dia, v)), x, iters
        )
        return roofline_report(
            "pallas_dia_spmv",
            dt,
            dia_spmv_bytes(dia.n_diags, dia.rows, dia.cols),
            flops=2 * dia.n_diags * dia.rows,
            peak_gbps=peak,
        )
    if ell_overhead(mat) < 1.0:
        ell = mat.to_ell()
        dt = chain_time(jax.jit(lambda v: ell_spmv(ell, v)), x, iters)
        return roofline_report(
            "xla_ell_spmv",
            dt,
            ell_spmv_bytes(ell.rows_pad, ell.width, ell.cols),
            flops=2 * ell.rows_pad * ell.width,
            peak_gbps=peak,
        )
    from ..ops.prod import spmv

    dt = chain_time(jax.jit(lambda v: spmv(mat, v)), x, iters)
    return roofline_report(
        "xla_csr_spmv",
        dt,
        csr_spmv_bytes(int(mat.nnz), mat.rows),
        flops=2 * int(mat.nnz),
        peak_gbps=peak,
    )
