"""Window gather/scatter primitive rates vs window width (round 5).

The windowed mf aggregate's cost is set by three primitives; this
measures each at the exact shapes the 65k plan uses so the kernel
formulation (vmap-dynamic_slice vs aligned 2-D row gather) is chosen
by data:

* G[w]: gather N windows of width w from a 50M-element array
  (vmap(dynamic_slice) — lowers to gather with slice sizes)
* G2[w]: same windows but width-aligned starts via a (P/w, w) 2-D view
  and a row take (embedding-lookup pattern)
* S[w]/S2[w]: the matching window scatter_adds.

Prints one JSON line per (prim, w) with effective GB/s.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=50_000_000)
    ap.add_argument("--nbytes-target", type=int, default=1 << 27)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from sprs_tpu.utils.profile import chain_time_best

    P = args.pool - args.pool % 1024  # divisible by every tested width
    pool = jnp.asarray(np.random.default_rng(0).random(P, np.float32))
    out = {"backend": jax.default_backend(), "rows": []}

    # health
    f = jax.jit(lambda v: v * 1.01 + 1)
    h = chain_time_best(f, jnp.ones((1 << 20,), jnp.float32), iters=20, rounds=2)
    out["health_ms"] = round(h * 1e3, 3)
    print(f"# health {h*1e3:.3f} ms", flush=True)

    rng = np.random.default_rng(1)

    for w in (32, 64, 128, 256):
        n_win = args.nbytes_target // (4 * w)
        starts_al = jnp.asarray(
            rng.integers(0, P // w - 1, n_win) * w, jnp.int32
        )
        starts_un = jnp.asarray(
            rng.integers(0, P - w - 1, n_win), jnp.int32
        )
        rows_ids = starts_al // w
        upd = jnp.asarray(
            rng.random((n_win, w), np.float32)
        )

        @jax.jit
        def g_vslice(pool_a, st, y):
            o = st + (y[0, 0] > 2).astype(jnp.int32)
            return jax.vmap(lambda q: lax.dynamic_slice(pool_a, (q,), (w,)))(o)

        @jax.jit
        def g_rows(pool_a, ids, y):
            p2 = pool_a.reshape(P // w, w)
            return p2[ids + (y[0, 0] > 2).astype(jnp.int32)]

        @jax.jit
        def s_window(pool_a, st, u, y):
            dn = lax.ScatterDimensionNumbers(
                update_window_dims=(1,),
                inserted_window_dims=(),
                scatter_dims_to_operand_dims=(0,),
            )
            arr = lax.scatter_add(
                pool_a,
                st[:, None],
                u + y[0, 0] * 0,
                dn,
                mode=lax.GatherScatterMode.CLIP,
            )
            return arr.reshape(-1, w)[:n_win]

        @jax.jit
        def s_rows(pool_a, ids, u, y):
            p2 = pool_a.reshape(P // w, w)
            return p2.at[ids].add(u + y[0, 0] * 0)[:n_win]

        cases = (
            ("gather_vslice", lambda y: g_vslice(pool, starts_un, y)),
            ("gather_rows2d", lambda y: g_rows(pool, rows_ids, y)),
            ("scatter_window", lambda y: s_window(pool, starts_un, upd, y)),
            ("scatter_rows2d", lambda y: s_rows(pool, rows_ids, upd, y)),
        )
        for name, fn in cases:
            t = chain_time_best(fn, upd, iters=args.iters, rounds=2)
            gbps = n_win * w * 4 / t / 1e9
            row = {
                "prim": name,
                "w": w,
                "n_win": int(n_win),
                "ms": round(t * 1e3, 3),
                "GBps": round(gbps, 2),
            }
            out["rows"].append(row)
            print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as fjs:
            json.dump(out, fjs)
            fjs.write("\n")


if __name__ == "__main__":
    main()
