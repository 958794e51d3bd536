"""Flat trisolve scan-unroll sweep (round-5 #8: short-level merge).

The flat solve measured LEVEL-BOUND at ~0.5 ms/scan-step (65k: 1.57 s
over ~2900 blocks, round 4).  ``unroll`` groups blocks per while-loop
iteration; this sweeps it same-process on a 65k nd factor.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--unrolls", default="1,4,8,16,32")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sprs_tpu.linalg import Ldl
    from sprs_tpu.linalg.trisolve import _flat_solve_csr
    from sprs_tpu.utils.profile import chain_time_best
    from sprs_tpu.utils.special import dirichlet_laplacian

    out = {"backend": jax.default_backend(), "grid": args.grid, "rows": []}

    f = jax.jit(lambda v: v * 1.01 + 1)
    h = chain_time_best(f, jnp.ones((1 << 20,), jnp.float32), iters=20, rounds=2)
    out["health_ms"] = round(h * 1e3, 3)
    print(f"# health {h*1e3:.3f} ms", flush=True)

    mat = dirichlet_laplacian((args.grid, args.grid))
    sym = Ldl().fill_in_reduction("nd").check_symmetry(False).symbolic(mat)
    num = sym.factor(mat, backend="super-batched")
    lo, up = sym.flat_scheds()
    out["nblocks"] = int(lo.nblocks)
    lcsr = num.l_csr()
    b0 = jnp.asarray(np.linspace(1.0, 2.0, sym.n).astype(np.float32))
    ref = None
    for u in (int(s) for s in args.unrolls.split(",")):
        step = jax.jit(
            lambda m, s, v, uu=u: _flat_solve_csr(
                m, v / (1.0 + jnp.abs(v[0])), s, unroll=uu
            )
        )
        import functools

        t = chain_time_best(
            functools.partial(step, lcsr, lo), b0,
            iters=args.iters, rounds=3,
        )
        x = np.asarray(step(lcsr, lo, b0))
        if ref is None:
            ref = x
        dmax = float(np.abs(x - ref).max())
        row = {
            "unroll": u,
            "lsolve_s": t,
            "ms_per_block": round(t * 1e3 / max(out["nblocks"], 1), 4),
            "max_diff_vs_u1": dmax,
        }
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
        if args.json:
            with open(args.json, "w") as fj:
                json.dump(out, fj)
                fj.write("\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
