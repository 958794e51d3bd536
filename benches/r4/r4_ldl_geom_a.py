import time, json, functools
import numpy as np, jax, jax.numpy as jnp
from sprs_tpu.linalg import Ldl
from sprs_tpu.linalg.ldl_batched import build_round_schedule, numeric_batched
from sprs_tpu.linalg.ldl_super import build_super_plan
from sprs_tpu.utils.profile import chain_time_best
from sprs_tpu.utils.special import dirichlet_laplacian

x = jnp.asarray(np.random.default_rng(0).random(1 << 20, np.float32))
h = chain_time_best(jax.jit(lambda v: v * 1.01 + 1), x, iters=20, rounds=2)
print(f"health {h*1e6:.0f} us/iter", flush=True)

mat = dirichlet_laplacian((256, 256))
data = mat.to_csr().data.astype(jnp.float32)
sym = Ldl().fill_in_reduction("nd").check_symmetry(False).symbolic(mat)

def step(pl, sc, d):
    lx, dd = numeric_batched(pl, sc, d)
    return d + 0.0 * dd[0] * lx[0]

results = {}
for rz, mw in ((0.85, 128), (0.5, 128), (0.85, 64), (0.3, 64)):
    try:
        plan = build_super_plan(sym, rel_zeros=rz, max_width=mw)
        for bu, bf in ((64, 64), (128, 128)) if rz == 0.85 and mw == 128 else ((64, 64),):
            sched = build_round_schedule(plan, bu=bu, bf=bf)
            t = chain_time_best(
                functools.partial(jax.jit(step), plan, sched),
                data, iters=4, rounds=3)
            key = f"rz{rz}_w{mw}_b{bu}"
            results[key] = dict(S=plan.S, W=plan.W, MR=plan.MR, T=plan.n_tasks,
                                R=sched.R, Bu=sched.Bu, Bf=sched.Bf,
                                ms=round(t*1e3, 1))
            print(f"{key}: S={plan.S} W={plan.W} MR={plan.MR} T={plan.n_tasks} "
                  f"R={sched.R} Bu={sched.Bu} Bf={sched.Bf} -> {t*1e3:.1f} ms",
                  flush=True)
    except Exception as e:
        print(f"rz{rz}_w{mw}: failed {e}", flush=True)
print(json.dumps(results), flush=True)
