"""Round-5 same-process A/B: windowed-multifrontal vs supernodal
batched LDL factor.

The round-4 verdict's #1 item: the batched factor is gather-volume
bound and the mf aggregate must beat the per-pair schedule once its
tables are window-granular.  Eligible comparisons are WITHIN this one
process only (tunnel speed swings 2-4x between processes).

Usage (real TPU, env untouched):
    PYTHONPATH=/root/repo:/root/.axon_site python benches/r5_mf_ab.py \
        --grid 256 --json benches/results_r5/mf_ab_65k.json
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--fill", default="nd")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--variants",
        default="super,mf32,mf64,mf128",
        help="comma list: super | mf<AW>[r<max_front_rows>][c<max_front_"
        "cols>][C][nc] — C = coarse buckets, nc = no cond guards",
    )
    ap.add_argument("--agg-limit", type=int, default=1 << 28)
    ap.add_argument("--rel-zeros", type=float, default=0.65)
    ap.add_argument("--max-width", type=int, default=128)
    ap.add_argument(
        "--no-host-check",
        action="store_true",
        help="skip the exact host-factor probe (1M-scale runs); a "
        "finite-d check still runs",
    )
    ap.add_argument("--map-limit", type=int, default=1 << 27)
    ap.add_argument("--panel-limit", type=int, default=1 << 28)
    args = ap.parse_args()

    out = {"grid": args.grid, "fill": args.fill, "variants": {}}

    def dump():
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f)
                f.write("\n")

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sprs_tpu.linalg import Ldl
    from sprs_tpu.linalg.ldl_batched import (
        build_round_schedule,
        numeric_batched,
    )
    from sprs_tpu.linalg.ldl_mf import build_mf_plan
    from sprs_tpu.linalg.ldl_super import build_super_plan
    from sprs_tpu.utils.profile import chain_time_best, fetch_scalar
    from sprs_tpu.utils.special import dirichlet_laplacian

    out["backend"] = jax.default_backend()
    print(f"# backend={out['backend']}", flush=True)

    # health reference: trivial elementwise chain — if this is slow the
    # tunnel is degraded and absolute numbers are garbage
    z = jnp.ones((1 << 20,), jnp.float32)
    f = jax.jit(lambda v: v * 1.01 + 1.0)
    t_health = chain_time_best(f, z, iters=20, rounds=2)
    out["health_ms"] = round(t_health * 1e3, 3)
    print(f"# health {t_health*1e3:.3f} ms/iter", flush=True)
    dump()

    t0 = time.perf_counter()
    mat = dirichlet_laplacian((args.grid, args.grid))
    sym = (
        Ldl().fill_in_reduction(args.fill).check_symmetry(False).symbolic(mat)
    )
    out["n"] = sym.n
    out["lnz"] = sym.nnz
    c = np.diff(np.asarray(sym.l_indptr)) - 1
    fl = float(np.sum(c * (c + 2.0)))
    out["useful_gflop"] = round(fl / 1e9, 3)
    out["t_symbolic_s"] = round(time.perf_counter() - t0, 2)
    print(f"# n={sym.n} lnz={sym.nnz} ({out['t_symbolic_s']}s)", flush=True)

    a = mat.to_csr()
    data = a.data.astype(jnp.float32)
    lims = dict(
        panel_limit=args.panel_limit,
        map_limit=args.map_limit,
        rel_zeros=args.rel_zeros,
        max_width=args.max_width,
    )

    def build(tag):
        if tag == "super":
            return build_super_plan(sym, **lims), None, {}
        if tag.startswith("superL"):
            v = int(tag[6:])
            return build_super_plan(sym, **lims), None, dict(bu=v, bf=v)
        assert tag.startswith("mf")
        rest = tag[2:]
        kw = dict(lims, agg_limit=args.agg_limit)
        use_cond = None
        sched_kw = {}
        if rest.endswith("nc"):
            rest = rest[:-2]
            use_cond = False
        if rest.endswith("C"):
            rest = rest[:-1]
            kw["buckets"] = "coarse"
        # parse suffixes right-to-left: L<lanes> then c<cols> then r<rows>
        for sep, apply in (
            ("L", lambda v: sched_kw.update(bu=v, bf=v)),
            ("c", lambda v: kw.update(max_front_cols=v)),
            ("r", lambda v: kw.update(max_front_rows=v)),
        ):
            if sep in rest:
                rest, _, v = rest.partition(sep)
                apply(int(v))
        kw["agg_window"] = int(rest)
        return build_mf_plan(sym, **kw), use_cond, sched_kw

    def batched_step(uc, pl, sc, d):
        lx, dd = numeric_batched(pl, sc, d, use_cond=uc)
        return d + 0.0 * dd[0] * lx[0]

    host_l = None
    for tag in args.variants.split(","):
        rec = {}
        t0 = time.perf_counter()
        try:
            plan, use_cond, sched_kw = build(tag)
        except Exception as e:
            out["variants"][tag] = {"error": str(e)}
            print(f"{tag}: plan failed: {e}", flush=True)
            dump()
            continue
        sched = build_round_schedule(plan, **sched_kw)
        rec["t_plan_s"] = round(time.perf_counter() - t0, 2)
        rec["R"] = sched.R
        rec["tasks"] = plan.n_tasks
        rec["Bu"] = sched.Bu
        rec["Bf"] = sched.Bf
        if hasattr(plan, "agg_table_elems"):
            rec["agg_MB"] = round(plan.agg_table_elems * 4 / 1e6, 1)
            rec["F"] = plan.F
            rec["ba"] = [int(s.shape[1]) for s in sched.agg_slots]
        step = functools.partial(
            jax.jit(batched_step, static_argnums=0), use_cond, plan, sched
        )
        t = chain_time_best(step, data, iters=args.iters, rounds=args.rounds)
        rec["factor_s"] = t
        rec["ms_per_round"] = round(t * 1e3 / max(sched.R, 1), 3)
        rec["gflops"] = round(fl / t / 1e9, 2)
        # correctness probe: d against the host factor (exact path)
        lx, d = jax.jit(numeric_batched)(plan, sched, data)
        if args.no_host_check:
            dh = np.asarray(d, np.float64)
            rec["d_finite"] = bool(np.isfinite(dh).all())
            rec["d_min"] = float(dh.min())
            rec["ok"] = rec["d_finite"] and rec["d_min"] > 0
        else:
            if host_l is None:
                num_h = sym.factor(mat, backend="host")
                host_l = (
                    np.asarray(num_h.l_data, np.float64),
                    np.asarray(num_h.d, np.float64),
                )
            d_err = float(
                np.abs(np.asarray(d, np.float64) - host_l[1]).max()
                / np.abs(host_l[1]).max()
            )
            l_err = float(
                np.abs(np.asarray(lx, np.float64) - host_l[0]).max()
                / (np.abs(host_l[0]).max() + 1.0)
            )
            rec["d_rel_err"] = d_err
            rec["l_rel_err"] = l_err
            rec["ok"] = bool(d_err < 1e-2 and l_err < 1e-2)
        out["variants"][tag] = rec
        print(
            f"{tag}: {t*1e3:.1f} ms (R={sched.R}, "
            f"{rec['ms_per_round']} ms/round, {rec['gflops']} GFLOP/s, "
            f"ok={rec['ok']})",
            flush=True,
        )
        dump()

    # paired ratios vs super within this process
    sup = out["variants"].get("super", {}).get("factor_s")
    if sup:
        for tag, rec in out["variants"].items():
            if "factor_s" in rec:
                rec["x_vs_super"] = round(sup / rec["factor_s"], 3)
    print(json.dumps(out), flush=True)
    dump()


if __name__ == "__main__":
    main()
