"""Round-4 phase bench: prove the batched-LDL round-floor fix.

Round 3 measured a ~10 ms/round fixed cost with every phase disabled
(results_r3/ldl_phase.json: `none` 470 ms ~= `full` 444 ms over R=43) —
the `lax.cond` phase guards' identity branches forced XLA to copy the
(P+MRW) panel carry per cond.  Round 4 removed the guards (phases are
sentinel-masked).  This script measures, in ONE process:

  full            production no-cond numeric (round-4 default)
  full_cond       the round-3 cond-guarded numeric (use_cond=True)
  none_cond       cond variant with all counts zeroed (the old floor)
  sentinel_nocond no-cond numeric on a schedule of PURE SENTINEL lanes
                  (same R) — the true per-round fixed cost of the new
                  path (target: <= 2 ms/round over the whole run)

Usage: python benches/r4/r4_ldl_phase.py --grid 256 --fill nd
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from sprs_tpu.linalg import Ldl
from sprs_tpu.linalg.ldl_batched import build_round_schedule, numeric_batched
from sprs_tpu.linalg.ldl_super import build_super_plan
from sprs_tpu.utils.profile import chain_time_best
from sprs_tpu.utils.special import dirichlet_laplacian


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--fill", default="nd")
    ap.add_argument("--rel-zeros", type=float, default=0.85)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    out = {"backend": jax.default_backend(), "grid": args.grid}

    def dump():
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f)
                f.write("\n")

    x = jnp.asarray(np.random.default_rng(0).random(1 << 20, np.float32))
    h = chain_time_best(jax.jit(lambda v: v * 1.01 + 1), x, iters=20, rounds=2)
    out["health_us"] = round(h * 1e6, 1)
    print(f"# health {h*1e6:.0f} us/iter", flush=True)

    mat = dirichlet_laplacian((args.grid, args.grid))
    sym = Ldl().fill_in_reduction(args.fill).check_symmetry(False).symbolic(mat)
    plan = build_super_plan(sym, rel_zeros=args.rel_zeros)
    sched = build_round_schedule(plan)
    out.update(S=plan.S, W=plan.W, MR=plan.MR, T=plan.n_tasks, R=sched.R,
               Bu=sched.Bu, Bf=sched.Bf)
    print(f"# S={plan.S} MR={plan.MR} T={plan.n_tasks} R={sched.R} "
          f"Bu={sched.Bu} Bf={sched.Bf}", flush=True)
    data = mat.to_csr().data.astype(jnp.float32)

    # all-sentinel schedule: every lane is padding (src/dst = S, tix =
    # the never-filled factor rmap row) — measures the no-cond path's
    # per-round fixed cost
    sent = dataclasses.replace(
        sched,
        upd_src=np.full_like(sched.upd_src, plan.S),
        upd_dst=np.full_like(sched.upd_dst, plan.S),
        upd_tix=np.full_like(sched.upd_tix, sched.upd_tix[0, -1]),
        upd_cnt=np.zeros_like(sched.upd_cnt),
        fac_s=np.full_like(sched.fac_s, plan.S),
        fac_cnt=np.zeros_like(sched.fac_cnt),
    )
    zeros_sched = dataclasses.replace(
        sched,
        upd_cnt=np.zeros_like(sched.upd_cnt),
        fac_cnt=np.zeros_like(sched.fac_cnt),
    )

    def step(use_cond, pl, sc, d):
        lx, dd = numeric_batched(pl, sc, d, use_cond=use_cond)
        return d + 0.0 * dd[0] * lx[0]

    variants = [
        ("full", False, sched),
        ("full_cond", True, sched),
        ("none_cond", True, zeros_sched),
        ("sentinel_nocond", False, sent),
    ]
    for name, uc, sc in variants:
        t = chain_time_best(
            functools.partial(
                jax.jit(functools.partial(step, uc)), plan, sc
            ),
            data,
            iters=args.iters,
            rounds=3,
        )
        out[name + "_s"] = t
        print(f"{name}: {t*1e3:.1f} ms ({t/sched.R*1e6:.0f} us/round)",
              flush=True)
        dump()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
