"""Per-phase breakdown of the level-batched LDL numeric on TPU.

The round-3 first measurement (benches/results_r3/ldl_256_nd.json) put
the batched numeric at 0.44 s / 43 rounds = ~10 ms per round — far
above the ~0.5 ms HBM-traffic bound.  This script splits a round into
its phases by zeroing the other phases' lane counts (the scan body's
``lax.cond`` guards then skip them) and chain-times each composition:

  full        = updates + aggregates + factors
  upd_only    = factors skipped
  fac_only    = updates skipped
  none        = all skipped (scan + xs-slicing floor)

Methodology per CLAUDE.md: health reference first, chained fetch-
terminated timing, one process, variants compared within it.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from sprs_tpu.linalg import Ldl
from sprs_tpu.linalg.ldl_batched import build_round_schedule, numeric_batched
from sprs_tpu.linalg.ldl_super import build_super_plan
from sprs_tpu.utils.profile import chain_time_best
from sprs_tpu.utils.special import dirichlet_laplacian


def main():
    import argparse

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
                json.dump(out, f); f.write("\n")

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

    def step(pl, sc, d):
        lx, dd = numeric_batched(pl, sc, d)
        return d + 0.0 * dd[0] * lx[0]

    zeros_u = np.zeros_like(sched.upd_cnt)
    zeros_f = np.zeros_like(sched.fac_cnt)
    variants = {
        "full": sched,
        "upd_only": dataclasses.replace(sched, fac_cnt=zeros_f),
        "fac_only": dataclasses.replace(sched, upd_cnt=zeros_u),
        "none": dataclasses.replace(
            sched, upd_cnt=zeros_u, fac_cnt=zeros_f
        ),
    }
    for name, sc in variants.items():
        t = chain_time_best(
            functools.partial(jax.jit(step), plan, sc),
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
