"""LDLᵀ refactorization benchmark: supernodal (MXU panels) vs row scan.

Perf gate from the round-1 review: supernodal device refactorization
must be >= 10x the sequential ``lax.scan`` row numeric on a >= 256²
dirichlet Laplacian.  Methodology per CLAUDE.md: chained steps
(``data = f(data)``), fetch-terminated, health-reference first, all
variants compared within ONE process.

Usage:
    python benches/ldl_bench.py [--grid 256] [--scan-grid 256]
        [--iters 5] [--dtype f32] [--json results.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sprs_tpu as st
from sprs_tpu.linalg import Ldl
from sprs_tpu.linalg.ldl import _numeric_device
from sprs_tpu.linalg.ldl_super import build_super_plan, numeric_supernodal
from sprs_tpu.utils.profile import chain_time_best
from sprs_tpu.utils.special import dirichlet_laplacian


def health_reference():
    """Trivial elementwise op; if this is slow the tunnel is degraded."""
    x = jnp.asarray(np.random.default_rng(0).random(1 << 20, np.float32))
    step = jax.jit(lambda x: x * 1.01 + 1.0)
    dt = chain_time_best(step, x, iters=20, rounds=2)
    return dt


def _scipy_baseline(a, n, iters=3):
    """Host f64 scipy splu factor+solve wall-clock on the same matrix.

    The external competitive anchor (reference discipline:
    sprs-benches compares against Eigen/scipy, main.rs:8-82) — TPU
    factor times are reported next to this, not only next to our own
    sequential scan."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    indptr = np.asarray(a.indptr).astype(np.int64)
    nnz = int(indptr[-1])
    A = sp.csc_matrix(
        (
            np.asarray(a.data)[:nnz].astype(np.float64),
            np.asarray(a.indices)[:nnz].astype(np.int64),
            indptr,
        ),
        shape=(n, n),
    )
    b = np.linspace(1.0, 2.0, n)
    best_f = float("inf")
    lu = None
    for _ in range(2):
        t0 = time.perf_counter()
        lu = spla.splu(A)
        best_f = min(best_f, time.perf_counter() - t0)
    best_s = float("inf")
    for _ in range(max(iters, 3)):
        t0 = time.perf_counter()
        _ = lu.solve(b)
        best_s = min(best_s, time.perf_counter() - t0)
    return {
        "scipy_splu_factor_s": best_f,
        "scipy_splu_solve_s": best_s,
        "scipy_splu_lnz": int(lu.L.nnz + lu.U.nnz),
    }


def prep(grid, fill="rcm"):
    mat = dirichlet_laplacian((grid, grid))
    t0 = time.perf_counter()
    sym = Ldl().fill_in_reduction(fill).check_symmetry(False).symbolic(mat)
    t_sym = time.perf_counter() - t0
    a = mat.to_csr()
    return mat, sym, a, t_sym


def useful_flops(sym):
    """Simplicial factorization flops: sum over columns of c*(c+2)."""
    c = np.diff(np.asarray(sym.l_indptr)) - 1  # below-diag counts
    return float(np.sum(c * (c + 2.0)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--scan-grid", type=int, default=None,
                    help="grid for the row-scan baseline (defaults to --grid)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scan-iters", type=int, default=2)
    ap.add_argument("--dtype", default="f32", choices=["f32", "f64"])
    ap.add_argument(
        "--fill", default="rcm", choices=["rcm", "camd", "nd", "none"]
    )
    ap.add_argument("--rel-zeros", type=float, default=0.65)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--skip-seq",
        action="store_true",
        help="skip the sequential supernodal scan variant (batched only)",
    )
    args = ap.parse_args()
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32

    out = {"backend": jax.default_backend(), "grid": args.grid}

    def dump():
        # incremental persistence: a SIGKILL mid-battery loses at most
        # the in-flight measurement (round-2 lost whole stages)
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f); f.write("\n")
    print(f"# backend={jax.default_backend()}", flush=True)
    h = health_reference()
    out["health_us"] = round(h * 1e6, 1)
    print(f"# health reference: {h*1e6:.0f} us/iter (want ~sub-ms)", flush=True)

    mat, sym, a, t_sym = prep(args.grid, args.fill)
    out["fill"] = args.fill
    n = sym.n
    out["n"] = n
    out["lnz"] = sym.nnz
    out["t_symbolic_s"] = round(t_sym, 3)
    dump()
    t0 = time.perf_counter()
    plan = build_super_plan(sym, rel_zeros=args.rel_zeros)
    out["t_plan_s"] = round(time.perf_counter() - t0, 3)
    out["snodes"] = plan.S
    out["W"] = plan.W
    out["MR"] = plan.MR
    out["tasks"] = plan.n_tasks
    out["panel_MB"] = round(plan.P * dtype.dtype.itemsize / 1e6, 1)
    fl = useful_flops(sym)
    out["useful_gflop"] = round(fl / 1e9, 3)
    print(f"# n={n} lnz={sym.nnz} snodes={plan.S} W={plan.W} MR={plan.MR} "
          f"tasks={plan.n_tasks} useful_gflop={fl/1e9:.2f}", flush=True)

    data = a.data.astype(dtype)

    # the plan is a PYTREE ARGUMENT (SuperPlan is registered): its
    # O(lnz) maps transfer once as buffers instead of embedding as HLO
    # constants in the remote compile payload
    import functools

    if not args.skip_seq:
        def super_step(pl, d):
            lx, dd = numeric_supernodal(pl, d)
            return d + 0.0 * dd[0] * lx[0]

        t_sup = chain_time_best(
            functools.partial(jax.jit(super_step), plan),
            data,
            iters=args.iters,
            rounds=3,
        )
        out["supernodal_s"] = t_sup
        out["supernodal_gflops"] = round(fl / t_sup / 1e9, 2)
        print(f"supernodal: {t_sup*1e3:.1f} ms/refactor "
              f"({fl/t_sup/1e9:.1f} useful GFLOP/s)", flush=True)
        dump()

    # level-batched rounds over the same plans (round-3 numeric)
    from sprs_tpu.linalg.ldl_batched import (
        build_round_schedule,
        numeric_batched,
    )
    from sprs_tpu.linalg.ldl_mf import build_mf_plan

    t0 = time.perf_counter()
    sched = build_round_schedule(plan)
    out["t_sched_s"] = round(time.perf_counter() - t0, 3)
    out["rounds"] = sched.R
    print(f"# batched schedule: R={sched.R} rounds "
          f"({plan.n_tasks} tasks)", flush=True)

    def batched_step(pl, sc, d):
        lx, dd = numeric_batched(pl, sc, d)
        return d + 0.0 * dd[0] * lx[0]

    t_bat = chain_time_best(
        functools.partial(jax.jit(batched_step), plan, sched),
        data,
        iters=args.iters,
        rounds=3,
    )
    out["batched_s"] = t_bat
    out["batched_gflops"] = round(fl / t_bat / 1e9, 2)
    print(f"batched-super: {t_bat*1e3:.1f} ms/refactor "
          f"({fl/t_bat/1e9:.1f} useful GFLOP/s)", flush=True)
    dump()

    try:
        t0 = time.perf_counter()
        mfp = build_mf_plan(sym, rel_zeros=args.rel_zeros)
        msched = build_round_schedule(mfp)
        out["t_mf_plan_s"] = round(time.perf_counter() - t0, 3)
        out["mf_tasks"] = mfp.n_tasks
        out["mf_rounds"] = msched.R
        t_mf = chain_time_best(
            functools.partial(jax.jit(batched_step), mfp, msched),
            data,
            iters=args.iters,
            rounds=3,
        )
        out["batched_mf_s"] = t_mf
        out["batched_mf_gflops"] = round(fl / t_mf / 1e9, 2)
        print(f"batched-mf: {t_mf*1e3:.1f} ms/refactor "
              f"({fl/t_mf/1e9:.1f} useful GFLOP/s) "
              f"R={msched.R}", flush=True)
    except Exception as e:
        out["batched_mf_s"] = None
        print(f"batched-mf: failed ({e})", flush=True)
    dump()

    # solve timings: level-scheduled vs supernodal panel solve (chained;
    # inner solves only — the O(n) permutation gathers are identical for
    # both methods).  Factor values / panels / L matrices are passed as
    # ARGUMENTS (CLAUDE.md: closing over big arrays embeds them as HLO
    # constants and balloons the remote-compile payload).
    from sprs_tpu.linalg.ldl_super import panels_from_csc, solve_supernodal
    from sprs_tpu.linalg.trisolve import _flat_solve_csr, _level_solve_csr

    from sprs_tpu.linalg.ldl import LdlNumeric

    lx_b, d_b = jax.jit(numeric_batched)(plan, sched, data)
    num = LdlNumeric(sym, lx_b, d_b)
    b0 = jnp.asarray(
        np.linspace(1.0, 2.0, n).astype(np.float32)
    ).astype(dtype)
    panels = panels_from_csc(plan, num.l_data)

    @jax.jit
    def run_super(pl, pn, dv, v):
        return solve_supernodal(pl, pn, dv, v / (1.0 + jnp.abs(v[0])))

    @jax.jit
    def run_levels(lc, lt, dv, v):
        x = _level_solve_csr(lc, v / (1.0 + jnp.abs(v[0])), sym.sched_lower)
        x = x / dv
        return _level_solve_csr(lt, x, sym.sched_upper)

    # flat O(lnz) stream solve — schedules are pytree ARGUMENTS (their
    # 5·lnz streams would otherwise embed as HLO constants)
    flat_lo, flat_up = sym.flat_scheds()

    @jax.jit
    def run_flat(lc, lt, slo, sup, dv, v):
        x = _flat_solve_csr(lc, v / (1.0 + jnp.abs(v[0])), slo)
        x = x / dv
        return _flat_solve_csr(lt, x, sup)

    def _time(fn, *ops):
        y = fn(*ops, b0)
        _ = float(jnp.asarray(y).reshape(-1)[0])  # compile + settle
        best = float("inf")
        iters = max(args.iters, 5)
        for _ in range(3):
            t0 = time.perf_counter()
            v = b0
            for _ in range(iters):
                v = fn(*ops, v)
            _ = float(jnp.asarray(v).reshape(-1)[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # the padded level kernel's per-level gather is
    # (level_width × max_row_nnz): pre-skip past the trisolve auto
    # cliff instead of burning a multi-minute remote compile on a
    # guaranteed OOM (round-3 advisor item)
    w_pad = max(
        int(np.diff(np.asarray(sym.lcsr_indptr)).max(initial=1)),
        int(np.diff(np.asarray(sym.l_indptr)).max(initial=1)),
    )
    levels_feasible = n * w_pad <= (1 << 24)

    variants = [
        ("super", run_super, (plan, panels, num.d)),
        ("flat", run_flat, (num.l_csr(), num.lt(), flat_lo, flat_up, num.d)),
    ]
    if levels_feasible:
        variants.append(("levels", run_levels, (num.l_csr(), num.lt(), num.d)))
    else:
        out["solve_levels_s"] = None
        out["solve_levels_skip"] = (
            f"padded n*w = {n}*{w_pad} > 2^24 — flat path covers it"
        )
        print(f"solve[levels]: pre-skipped ({out['solve_levels_skip']})",
              flush=True)
    for meth, fn, ops in variants:
        try:
            t_sol = _time(fn, *ops)
            out[f"solve_{meth}_s"] = t_sol
            print(f"solve[{meth}]: {t_sol*1e3:.2f} ms", flush=True)
        except Exception as e:  # level solve may OOM on fill-heavy factors
            out[f"solve_{meth}_s"] = None
            print(f"solve[{meth}]: failed ({e})", flush=True)
        dump()

    # external host baseline: scipy splu (f64) factor + solve wall-clock
    # on the same matrix (VERDICT r3 #4 — a competitive anchor, not our
    # own scan)
    try:
        t_ext = _scipy_baseline(a, n)
        out.update(t_ext)
        print(
            f"scipy splu: factor {t_ext['scipy_splu_factor_s']*1e3:.1f} ms, "
            f"solve {t_ext['scipy_splu_solve_s']*1e3:.2f} ms",
            flush=True,
        )
    except Exception as e:
        out["scipy_splu_factor_s"] = None
        print(f"scipy splu baseline failed: {e}", flush=True)
    dump()

    # row-scan baseline (optionally smaller grid if the full size is
    # prohibitively slow -- report normalized per-flop time too)
    if args.scan_iters == 0:
        print(json.dumps(out), flush=True)
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f); f.write("\n")
        return
    sg = args.scan_grid or args.grid
    if sg == args.grid:
        sym2, a2, fl2 = sym, a, fl
    else:
        _, sym2, a2, _ = prep(sg)
        fl2 = useful_flops(sym2)
    out["scan_grid"] = sg

    def scan_step(d):
        lx, dd = _numeric_device(sym2, d)
        return d + 0.0 * dd[0] * lx[0]

    t_scan = chain_time_best(
        jax.jit(scan_step), a2.data.astype(dtype),
        iters=args.scan_iters, rounds=1
    )
    out["scan_s"] = t_scan
    out["scan_gflops"] = round(fl2 / t_scan / 1e9, 3)
    t_ref = out.get("supernodal_s") or out["batched_s"]
    speedup = (t_scan / fl2) / (t_ref / fl)
    out["speedup_per_flop"] = round(speedup, 1)
    if sg == args.grid:
        out["speedup"] = round(t_scan / t_ref, 1)
    print(f"row-scan (grid {sg}): {t_scan*1e3:.1f} ms/refactor "
          f"({fl2/t_scan/1e9:.2f} useful GFLOP/s)", flush=True)
    print(f"speedup (per-flop normalized): {speedup:.1f}x", flush=True)
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f); f.write("\n")


if __name__ == "__main__":
    main()
