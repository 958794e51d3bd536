"""Large-scale LDLᵀ end-to-end: symbolic → plan → batched factor →
panel solve, with per-stage incremental JSON (kill-proof).

Targets the round-3 scale items: a 512² (262k-row) and 1024² (1M-row)
Dirichlet Laplacian factored ON CHIP with the level-batched numeric.
Host stages (symbolic/plan/schedule) report sizes and wall-clock; the
device stages report chained refactorization and solve times plus
achieved useful GFLOP/s.

Usage:
    python benches/ldl_big.py --grid 512 --fill nd --json out.json
    python benches/ldl_big.py --grid 1024 --fill nd --plan-only
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--fill", default="nd", choices=["nd", "camd", "rcm"])
    ap.add_argument("--rel-zeros", type=float, default=0.85)
    ap.add_argument("--max-width", type=int, default=128)
    ap.add_argument("--kind", default="mf", choices=["mf", "super"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--panel-limit", type=int, default=1 << 28)
    ap.add_argument("--map-limit", type=int, default=1 << 27)
    ap.add_argument("--agg-limit", type=int, default=1 << 28)
    ap.add_argument(
        "--rtol",
        type=float,
        default=2e-3,
        help="pass bar on the relative backward error "
        "||Ax-b||inf/(||A||inf*||x||inf+||b||inf); f32 LDL accumulates "
        "over column lengths up to MR (~1e3 here), so the expected "
        "scale is O(eps_f32 * MR) ~ 1e-4; 2e-3 leaves a 10-20x margin",
    )
    ap.add_argument(
        "--no-flat",
        action="store_true",
        help="skip the flat-solve timing/cross-check (its 5*lnz "
        "schedule transfer crashed the TPU worker at lnz=40M)",
    )
    ap.add_argument(
        "--host-check",
        default="auto",
        choices=["auto", "on", "off"],
        help="cross-check the device factor against the exact f64 host "
        "numeric (auto: on for n <= 300k)",
    )
    args = ap.parse_args()

    out = {"grid": args.grid, "fill": args.fill, "kind": args.kind}

    def dump():
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f); f.write("\n")

    import jax
    import jax.numpy as jnp

    import sprs_tpu as st  # noqa: F401
    from sprs_tpu.linalg import Ldl
    from sprs_tpu.linalg.ldl_batched import (
        build_round_schedule,
        numeric_batched,
    )
    from sprs_tpu.linalg.ldl_mf import build_mf_plan
    from sprs_tpu.linalg.ldl_super import build_super_plan
    from sprs_tpu.utils.special import dirichlet_laplacian

    out["backend"] = jax.default_backend()
    print(f"# backend={out['backend']}", flush=True)

    t0 = time.perf_counter()
    mat = dirichlet_laplacian((args.grid, args.grid))
    sym = (
        Ldl().fill_in_reduction(args.fill).check_symmetry(False).symbolic(mat)
    )
    out["t_symbolic_s"] = round(time.perf_counter() - t0, 2)
    out["n"] = sym.n
    out["lnz"] = sym.nnz
    c = np.diff(np.asarray(sym.l_indptr)) - 1
    fl = float(np.sum(c * (c + 2.0)))
    out["useful_gflop"] = round(fl / 1e9, 3)
    print(
        f"# n={sym.n} lnz={sym.nnz} gflop={fl/1e9:.2f} "
        f"sym={out['t_symbolic_s']}s",
        flush=True,
    )
    dump()

    t0 = time.perf_counter()
    kw = dict(
        max_width=args.max_width,
        rel_zeros=args.rel_zeros,
        panel_limit=args.panel_limit,
        map_limit=args.map_limit,
    )
    if args.kind == "mf":
        plan = build_mf_plan(sym, agg_limit=args.agg_limit, **kw)
        out["agg_table_MB"] = round(plan.agg_table_elems * 4 / 1e6, 1)
    else:
        plan = build_super_plan(sym, **kw)
    out["t_plan_s"] = round(time.perf_counter() - t0, 2)
    out["S"] = plan.S
    out["W"] = plan.W
    out["MR"] = plan.MR
    out["P"] = plan.P
    out["tasks"] = plan.n_tasks
    out["panel_MB"] = round(plan.P * 4 / 1e6, 1)
    out["rmap_MB"] = round(plan.t_rmap.size * 4 / 1e6, 1)
    print(
        f"# plan: S={plan.S} W={plan.W} MR={plan.MR} T={plan.n_tasks} "
        f"panel={out['panel_MB']}MB rmap={out['rmap_MB']}MB "
        f"({out['t_plan_s']}s)",
        flush=True,
    )
    dump()

    t0 = time.perf_counter()
    sched = build_round_schedule(plan)
    out["t_sched_s"] = round(time.perf_counter() - t0, 2)
    out["rounds"] = sched.R
    out["Bu"] = sched.Bu
    out["Bf"] = sched.Bf
    print(
        f"# schedule: R={sched.R} Bu={sched.Bu} Bf={sched.Bf} "
        f"({out['t_sched_s']}s)",
        flush=True,
    )
    dump()
    if args.plan_only:
        print(json.dumps(out), flush=True)
        return

    from sprs_tpu.utils.profile import chain_time_best

    a = mat.to_csr()
    data = a.data.astype(jnp.float32)

    import functools

    def batched_step(pl, sc, d):
        lx, dd = numeric_batched(pl, sc, d)
        return d + 0.0 * dd[0] * lx[0]

    t_fac = chain_time_best(
        functools.partial(jax.jit(batched_step), plan, sched),
        data,
        iters=args.iters,
        rounds=3,
    )
    out["factor_s"] = t_fac
    out["factor_gflops"] = round(fl / t_fac / 1e9, 2)
    print(
        f"batched factor: {t_fac*1e3:.1f} ms ({fl/t_fac/1e9:.1f} GFLOP/s)",
        flush=True,
    )
    dump()

    # panel solve on the batched factor
    from sprs_tpu.linalg.ldl_super import panels_from_csc, solve_supernodal

    lx, d = jax.jit(numeric_batched)(plan, sched, data)
    panels = panels_from_csc(plan, lx)
    b0 = jnp.asarray(np.linspace(1.0, 2.0, sym.n).astype(np.float32))

    @jax.jit
    def run_solve(pl, pn, dv, v):
        return solve_supernodal(pl, pn, dv, v / (1.0 + jnp.abs(v[0])))

    y = run_solve(plan, panels, d, b0)
    _ = float(np.asarray(y)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v = b0
        for _ in range(max(args.iters, 3)):
            v = run_solve(plan, panels, d, v)
        _ = float(np.asarray(v)[0])
        best = min(best, (time.perf_counter() - t0) / max(args.iters, 3))
    out["solve_s"] = best
    print(f"panel solve: {best*1e3:.2f} ms", flush=True)
    dump()

    # round-batched panel solve (round 5): the factor rounds double as
    # the solve level schedule — R scan steps instead of S
    from sprs_tpu.linalg.ldl_batched import solve_batched

    @jax.jit
    def run_solve_b(pl, sc, pn, dv, v):
        return solve_batched(pl, sc, pn, dv, v / (1.0 + jnp.abs(v[0])))

    yb = run_solve_b(plan, sched, panels, d, b0)
    out["solve_batched_max_diff"] = float(
        jnp.abs(yb - y).max()
    )
    _ = float(np.asarray(yb)[0])
    best_b = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v = b0
        for _ in range(max(args.iters, 3)):
            v = run_solve_b(plan, sched, panels, d, v)
        _ = float(np.asarray(v)[0])
        best_b = min(best_b, (time.perf_counter() - t0) / max(args.iters, 3))
    out["solve_batched_s"] = best_b
    print(
        f"batched solve: {best_b*1e3:.2f} ms "
        f"(x{best/best_b:.2f} vs sequential; "
        f"diff {out['solve_batched_max_diff']:.2e})",
        flush=True,
    )
    dump()

    from sprs_tpu.linalg.ldl import LdlNumeric
    from sprs_tpu.linalg.trisolve import _flat_solve_csr

    num = LdlNumeric(sym, lx, d)

    # ---- correctness: relative backward error with a pass bar --------
    # (round-4 verdict #2: the raw inf-norm residual at 262k read 122.9
    # with b=ones — but ||x||inf ~ 33k there, so the RELATIVE backward
    # error was ~5e-4: f32-accumulation scale, not a broken factor.
    # Make that explicit and asserted.)
    ones = np.ones(sym.n, np.float32)
    bb = jnp.asarray(ones)
    if sym.perm is not None:
        bb = bb[jnp.asarray(sym.perm.perm)]
    xs = solve_supernodal(plan, panels, d, bb)
    if sym.perm is not None:
        xs = xs[jnp.asarray(sym.perm.inv)]
    x_np = np.asarray(xs, np.float64)
    r = np.asarray(st.spmv(mat, np.asarray(xs)), np.float64) - 1.0
    # host ||A||inf on the live entries
    ip = np.asarray(mat.to_csr().indptr).astype(np.int64)
    da = np.abs(np.asarray(mat.to_csr().data)[: int(ip[-1])])
    norm_a = float(
        np.bincount(
            np.repeat(np.arange(sym.n), np.diff(ip)),
            weights=da,
            minlength=sym.n,
        ).max()
    )
    denom = norm_a * np.abs(x_np).max() + 1.0
    out["residual_inf"] = float(np.abs(r).max())
    out["residual_rel"] = float(np.abs(r).max() / denom)
    out["norm_a_inf"] = norm_a
    out["norm_x_inf"] = float(np.abs(x_np).max())
    out["residual_ok"] = bool(out["residual_rel"] < args.rtol)
    print(
        f"residual_inf={out['residual_inf']:.3e} "
        f"rel={out['residual_rel']:.3e} (bar {args.rtol:.0e}) "
        f"ok={out['residual_ok']}",
        flush=True,
    )
    dump()

    # flat O(lnz) stream solve at scale — AFTER the residual verdict:
    # the (5·lnz)-element schedule transfer crashed the TPU worker at
    # lnz=40M (round-4 ldl1024) and must not cost the correctness probe
    if not args.no_flat:
        try:
            t0 = time.perf_counter()
            flat_lo, flat_up = sym.flat_scheds()
            out["t_flat_sched_s"] = round(time.perf_counter() - t0, 2)

            @jax.jit
            def run_flat(lc, lt, slo, sup, dv, v):
                xx = _flat_solve_csr(lc, v / (1.0 + jnp.abs(v[0])), slo)
                xx = xx / dv
                return _flat_solve_csr(lt, xx, sup)

            fops = (num.l_csr(), num.lt(), flat_lo, flat_up, num.d)
            y = run_flat(*fops, b0)
            _ = float(np.asarray(y)[0])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                v = b0
                for _ in range(max(args.iters, 3)):
                    v = run_flat(*fops, v)
                _ = float(np.asarray(v)[0])
                best = min(
                    best, (time.perf_counter() - t0) / max(args.iters, 3)
                )
            out["solve_flat_s"] = best
            print(f"flat solve: {best*1e3:.2f} ms", flush=True)
            # two independent solve kernels must agree to f32 rounding
            xf = _flat_solve_csr(num.l_csr(), bb, flat_lo)
            xf = xf / num.d
            xf = _flat_solve_csr(num.lt(), xf, flat_up)
            if sym.perm is not None:
                xf = xf[jnp.asarray(sym.perm.inv)]
            dx = float(np.abs(np.asarray(xf, np.float64) - x_np).max())
            out["flat_vs_panel_inf"] = dx
            out["flat_vs_panel_rel"] = dx / (np.abs(x_np).max() + 1.0)
            print(
                f"flat-vs-panel rel diff {out['flat_vs_panel_rel']:.3e}",
                flush=True,
            )
        except Exception as e:
            out["solve_flat_s"] = None
            print(f"flat solve failed: {e}", flush=True)
        dump()

    # ---- external f64 baseline + forward-error cross-check -----------
    try:
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        acsr = mat.to_csr()
        nnz_a = int(ip[-1])
        A = sp.csc_matrix(
            (
                np.asarray(acsr.data)[:nnz_a].astype(np.float64),
                np.asarray(acsr.indices)[:nnz_a].astype(np.int64),
                ip,
            ),
            shape=(sym.n, sym.n),
        )
        t0 = time.perf_counter()
        lu = spla.splu(A)
        out["scipy_splu_factor_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        x_ref = lu.solve(np.ones(sym.n))
        out["scipy_splu_solve_s"] = time.perf_counter() - t0
        out["scipy_splu_lnz"] = int(lu.L.nnz + lu.U.nnz)
        r_ref = A @ x_ref - 1.0
        out["scipy_rel_resid"] = float(
            np.abs(r_ref).max() / (norm_a * np.abs(x_ref).max() + 1.0)
        )
        # forward error of the TPU solution vs the f64 reference —
        # expected up to cond(A)*residual_rel, reported for color
        out["fwd_err_rel"] = float(
            np.abs(x_np - x_ref).max() / np.abs(x_ref).max()
        )
        print(
            f"scipy splu: factor {out['scipy_splu_factor_s']:.2f}s "
            f"solve {out['scipy_splu_solve_s']*1e3:.1f}ms "
            f"lnz={out['scipy_splu_lnz']} "
            f"fwd_err_rel={out['fwd_err_rel']:.3e}",
            flush=True,
        )
    except Exception as e:
        out["scipy_splu_factor_s"] = None
        print(f"scipy baseline failed: {e}", flush=True)
    dump()

    # ---- exact f64 host-factor cross-check ----------------------------
    hc = args.host_check
    if hc == "auto":
        hc = "on" if sym.n <= 300_000 else "off"
    if hc == "on":
        try:
            t0 = time.perf_counter()
            num_h = LdlNumeric.factor(sym, mat, backend="host")
            out["t_host_factor_s"] = round(time.perf_counter() - t0, 2)
            d_h = np.asarray(num_h.d, np.float64)
            d_t = np.asarray(d, np.float64)
            out["d_rel_err"] = float(
                np.abs(d_t - d_h).max() / np.abs(d_h).max()
            )
            l_h = np.asarray(num_h.l_data, np.float64)
            l_t = np.asarray(lx, np.float64)
            out["l_rel_err"] = float(
                np.abs(l_t - l_h).max() / (np.abs(l_h).max() + 1.0)
            )
            out["factor_ok"] = bool(
                out["d_rel_err"] < 1e-2 and out["l_rel_err"] < 1e-2
            )
            print(
                f"host f64 cross-check: d_rel_err={out['d_rel_err']:.3e} "
                f"l_rel_err={out['l_rel_err']:.3e} ok={out['factor_ok']} "
                f"({out['t_host_factor_s']}s)",
                flush=True,
            )
        except Exception as e:
            out["factor_ok"] = None
            print(f"host cross-check failed: {e}", flush=True)
        dump()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
