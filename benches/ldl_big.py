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
    args = ap.parse_args()

    out = {"grid": args.grid, "fill": args.fill, "kind": args.kind}

    def dump():
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f)

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

    # correctness probe: ||A x − b||_inf through the panel solve (the
    # level solve would OOM at this scale; permutation applied manually
    # so no second plan build is triggered)
    ones = np.ones(sym.n, np.float32)
    bb = jnp.asarray(ones)
    if sym.perm is not None:
        bb = bb[jnp.asarray(sym.perm.perm)]
    xs = solve_supernodal(plan, panels, d, bb)
    if sym.perm is not None:
        xs = xs[jnp.asarray(sym.perm.inv)]
    r = np.asarray(st.spmv(mat, np.asarray(xs))) - 1.0
    out["residual_inf"] = float(np.abs(r).max())
    print(f"residual_inf={out['residual_inf']:.3e}", flush=True)
    dump()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
