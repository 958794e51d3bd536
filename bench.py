"""Benchmark: SpMV throughput vs HBM-bandwidth roofline on the default
backend (real TPU under the driver; CPU if JAX_PLATFORMS=cpu).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is the
self-measured speed-of-light: the roofline fraction target from
BASELINE.json is 80% of HBM bandwidth; ``vs_baseline`` is
achieved_fraction / 0.80 (>1 beats the target).

Methodology (round-2 revision): both the numerator (SpMV) and the
denominator (streaming copy) are timed as ``inner`` chained steps fused
into ONE dispatch via ``lax.fori_loop``.  Host-side chains pay the axon
tunnel's per-DISPATCH latency once per iteration (~2-6 ms), which is the
same order as the kernel itself at this problem size — round-1's 0.54
headline was mostly that floor, not the kernel.  Fusing the chain
amortizes the floor over ``inner`` executions and measures true device
time; pairing copy and SpMV within each round cancels the tunnel's
slow drift.  The jitted fori runners are built ONCE so rounds never
recompile.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch_scalar(y) -> float:
    leaf = jax.tree_util.tree_leaves(y)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def _chain_time(step, x0, iters: int) -> float:
    """Per-iteration seconds of a host-chained y = step(y) loop.

    A scalar fetch (not block_until_ready) terminates the timing: through
    the axon TPU tunnel block_until_ready sometimes acks before the chain
    has executed, giving impossibly high numbers; a device->host read of
    the final value cannot lie.  Used only for the health probe — real
    measurements use the fori-fused runners below."""
    y = step(x0)
    _ = _fetch_scalar(y)  # compile + settle
    t0 = time.perf_counter()
    y = x0
    for _ in range(iters):
        y = step(y)
    _ = _fetch_scalar(y)
    return (time.perf_counter() - t0) / iters


def _make_fori_runner(step2, inner: int):
    """jit(lambda m, x: fori_loop chaining step2(m, .) inner times).

    Built once per kernel so repeated measurement rounds reuse the same
    executable (a fresh jit wrapper per round would recompile through
    the remote-compile tunnel every time)."""

    @jax.jit
    def run(m, x):
        return jax.lax.fori_loop(
            0, inner, lambda i, y: step2(m, y), x
        )

    return run


def _time_runner(run, operand, x0, inner: int) -> float:
    """One timed dispatch of a prepared fori runner (seconds/iter)."""
    t0 = time.perf_counter()
    y = run(operand, x0)
    _ = _fetch_scalar(y)
    return (time.perf_counter() - t0) / inner


def spmv_bytes(nnz: int, rows: int, dtype_bytes: int = 4, idx_bytes: int = 4) -> int:
    """Minimum HBM traffic of one CSR SpMV (speed-of-light accounting):
    data + indices streamed once, one x gather per nnz, y written once,
    indptr streamed once."""
    return nnz * (dtype_bytes + idx_bytes + dtype_bytes) + rows * (
        dtype_bytes + idx_bytes
    )


def _laplacian_dia(side: int):
    from sprs_tpu.utils.special import grid_laplacian

    mat = grid_laplacian((side, side), dtype=np.float32)
    return mat.to_dia(), int(mat.nnz)


def main():
    import sys

    # If the TPU tunnel is hard-down (backend init UNAVAILABLE — seen
    # for hours at a stretch), fall back to CPU rather than crash with
    # no JSON: the backend field in the output keeps the record honest.
    try:
        jax.devices()
    except RuntimeError as e:
        print(f"# backend init failed ({e}); CPU fallback", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        jax.devices()

    # Drain any tunnel wedge left by a previously killed process: the
    # first small transfer can take minutes; do it before timing.
    t0 = time.perf_counter()
    probe = jnp.asarray(np.ones(262144, np.float32))
    _ = float(np.asarray(probe[7]))
    drain_s = time.perf_counter() - t0
    health = _chain_time(
        jax.jit(lambda x: x * 1.000001 + 0.5), probe, 10
    )
    print(
        f"# drain {drain_s:.1f}s, trivial 1MB chain {health*1e3:.2f} "
        "ms/iter (healthy < 1 ms; degraded tunnel states reach 60+)",
        file=sys.stderr,
    )

    from sprs_tpu.formats.dia import dia_spmv
    from sprs_tpu.ops.pallas import dia_spmv_pallas, dia_tile

    on_tpu = jax.default_backend() == "tpu"

    # --- compiled-Pallas gate (round-5 verdict #7): compile every
    # production Pallas kernel FOR REAL (not interpret mode, which is
    # what CI exercises) at a small shape and compare against its XLA
    # twin.  A Mosaic regression fails loudly here in seconds instead
    # of silently shipping a wrong or uncompilable kernel.
    gate = {"ok": None, "kernels": {}}
    if on_tpu:
        gate["ok"] = True
        gdia, _ = _laplacian_dia(64)  # 4096 rows, small & fast
        gx = jnp.asarray(
            np.random.default_rng(7).random(gdia.rows, np.float32)
        )
        ref = np.asarray(dia_spmv(gdia, gx))
        gtiled = dia_tile(gdia)
        checks = {
            "dia_lag": lambda: dia_spmv_pallas(gdia, gx),
            "dia_tiled_flatg": lambda: gtiled.spmv(gx),
            "dia_manual_dma": lambda: gtiled.spmv(
                gx, variant="manual", depth=4
            ),
        }
        from sprs_tpu.formats.bsr import bsr_random, bsr_spmm_xla
        from sprs_tpu.ops.pallas import bsr_spmm_pallas

        gb = bsr_random(
            jax.random.PRNGKey(0), (512, 384), 128, block_density=0.4
        )
        gX = jnp.asarray(
            np.random.default_rng(8).random((384, 128), np.float32)
        )
        bref = np.asarray(bsr_spmm_xla(gb, gX))
        checks["bsr_spmm"] = lambda: bsr_spmm_pallas(gb, gX)
        refs = {
            "dia_lag": ref,
            "dia_tiled_flatg": ref,
            "dia_manual_dma": ref,
            "bsr_spmm": bref,
        }
        for gname, fn in checks.items():
            try:
                got = np.asarray(fn())
                dmax = float(
                    np.abs(got - refs[gname]).max()
                    / (np.abs(refs[gname]).max() + 1e-30)
                )
                ok = bool(dmax < 1e-5)
                gate["kernels"][gname] = {
                    "ok": ok,
                    "rel_max_diff": dmax,
                }
            except Exception as e:
                ok = False
                gate["kernels"][gname] = {
                    "ok": False,
                    "error": f"{type(e).__name__}: {str(e)[:160]}",
                }
            if not ok:
                gate["ok"] = False
                print(
                    f"# PALLAS GATE FAIL: {gname}: "
                    f"{gate['kernels'][gname]}",
                    file=sys.stderr,
                )
        print(
            f"# pallas gate: {'PASS' if gate['ok'] else 'FAIL'} "
            f"({', '.join(gate['kernels'])})",
            file=sys.stderr,
        )
    inner = 24 if on_tpu else 4
    dia, nnz = _laplacian_dia(4096 if on_tpu else 512)
    n = dia.rows
    tiled = dia_tile(dia)  # prepared layout (solver-loop path)
    x = jnp.asarray(np.random.default_rng(0).random(n, dtype=np.float32))
    useful_bytes = (dia.n_diags + 2) * n * 4

    # Copy denominator: same fori fusion, 2 bytes moved per element/iter.
    copy_nbytes = 1 << 28 if on_tpu else 1 << 24
    cx = jnp.asarray(
        np.random.default_rng(3).random(copy_nbytes // 4, dtype=np.float32)
    )
    copy_run = _make_fori_runner(lambda m, y: y * 1.000001 + 0.5, inner)

    # Speed-of-light TWIN of the SpMV access pattern: read the same W
    # diagonal streams + y, write y — identical byte traffic
    # ((W+2)·n·4, the useful_bytes accounting below) with zero sparse
    # logic (no rolls, no index math).  If the best SpMV kernel matches
    # the twin, the kernel IS at the chip's streaming limit for this
    # pattern and any residual gap to 2-stream copy peak is the
    # multi-stream penalty, not kernel inefficiency.
    w_d = dia.n_diags
    d_flat = jnp.reshape(dia.data.astype(jnp.float32), (-1,))[: w_d * n]

    def _twin_step(d, y):
        acc = y
        for j in range(w_d):
            acc = acc + d[j * n : (j + 1) * n]
        return acc

    twin_run = _make_fori_runner(_twin_step, inner)

    kernels = {"xla_dia": (_make_fori_runner(dia_spmv, inner), dia)}
    if on_tpu:
        # interpret-mode Pallas (the only option off-TPU) is a Python
        # emulator — meaningless to time, and minutes-slow fused 24-deep.
        kernels["pallas_dia_tiled"] = (
            _make_fori_runner(lambda m, v: m.spmv(v), inner),
            tiled,
        )
        kernels["pallas_dia_lag"] = (
            _make_fori_runner(
                lambda m, v: dia_spmv_pallas(m, v), inner
            ),
            dia,
        )
        # hand-pipelined explicit-DMA variant (make_async_copy depth 4)
        kernels["pallas_dia_manual"] = (
            _make_fori_runner(
                lambda m, v: m.spmv(v, variant="manual", depth=4),
                inner,
            ),
            tiled,
        )

    # warm (compile) everything once before any timed round, then one
    # throwaway executed round: copy bandwidth ramps within a process,
    # and a cold first copy round under-measures the denominator
    # (observed frac > 1 artifacts).
    _ = _fetch_scalar(copy_run(None, cx))
    _ = _fetch_scalar(twin_run(d_flat, x))
    for name in list(kernels):
        run, mat = kernels[name]
        try:
            _ = _fetch_scalar(run(mat, x))
        except Exception as e:  # experimental variants must not kill
            # the headline number — drop them with a visible note.
            print(
                f"# kernel {name} failed to compile/run, dropped: "
                f"{type(e).__name__}: {str(e)[:200]}",
                file=sys.stderr,
            )
            del kernels[name]
    _ = _time_runner(copy_run, None, cx, inner)
    _ = _time_runner(copy_run, None, cx, inner)

    # The tunnel chip's absolute speed varies between measurements and
    # drifts slowly; measure copy peak and SpMV in interleaved rounds
    # and report the best PAIRED ratio so drift cancels.
    best = None
    best_twin_frac = 0.0
    twin_best_gbps = 0.0
    kernel_best = {k: float("inf") for k in kernels}
    for r in range(6):
        peak = (
            2.0
            * copy_nbytes
            / _time_runner(copy_run, None, cx, inner)
            / 1e9
        )
        twin_gbps = (
            useful_bytes / _time_runner(twin_run, d_flat, x, inner) / 1e9
        )
        twin_best_gbps = max(twin_best_gbps, twin_gbps)
        times = {
            k: _time_runner(run, mat, x, inner)
            for k, (run, mat) in kernels.items()
        }
        for k, dt in times.items():
            kernel_best[k] = min(kernel_best[k], dt)
        kbest = min(times, key=times.get)
        dt = times[kbest]
        gbps = useful_bytes / dt / 1e9
        frac = gbps / peak if peak > 0 else 0.0
        twin_frac = gbps / twin_gbps if twin_gbps > 0 else 0.0
        best_twin_frac = max(best_twin_frac, twin_frac)
        print(
            f"# round {r}: spmv {gbps:.1f} GB/s ({kbest}), "
            f"copy {peak:.1f} GB/s, twin {twin_gbps:.1f} GB/s, "
            f"frac {frac:.3f}, twin_frac {twin_frac:.3f}",
            file=sys.stderr,
        )
        if best is None or frac > best[0]:
            best = (frac, kbest, dt, gbps, peak, twin_gbps, twin_frac)
    frac, kbest, dt, gbps, peak, twin_gbps, twin_frac = best
    result = {
        "metric": "spmv_hbm_roofline_fraction",
        "value": round(frac, 4),
        "unit": "fraction_of_measured_copy_bw",
        "vs_baseline": round(frac / 0.80, 4),
        "detail": {
            "kernel": kbest,
            "spmv_effective_GBps": round(gbps, 2),
            "copy_peak_GBps": round(peak, 2),
            # speed-of-light twin: same (W+2)-stream traffic, no sparse
            # logic — spmv/twin ≈ 1 proves the kernel is at the chip's
            # streaming limit for this access pattern.  Same-round as
            # the reported spmv/copy pair (mutually consistent);
            # *_best are the per-session maxima across rounds.
            "stream_twin_GBps": round(twin_gbps, 2),
            "frac_vs_stream_twin": round(twin_frac, 4),
            "stream_twin_GBps_best": round(twin_best_gbps, 2),
            "frac_vs_stream_twin_best": round(best_twin_frac, 4),
            "gnnz_per_s": round(nnz / dt / 1e9, 3),
            "spmv_gflops": round(2 * nnz / dt / 1e9, 3),
            "pallas_vs_xla_speedup": round(
                kernel_best["xla_dia"]
                / min(
                    v
                    for k2, v in kernel_best.items()
                    if k2 != "xla_dia"
                ),
                3,
            )
            if on_tpu
            else None,
            "rows": n,
            "nnz": nnz,
            "timing": f"fori_loop x{inner} fused dispatch",
            "backend": jax.default_backend(),
            "trivial_chain_ms": round(health * 1e3, 2),
            "pallas_gate": gate,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
