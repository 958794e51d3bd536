"""MXU precision sweep for the densified SpGEMM path.

The round-4 sweep measured spgemm_dense (precision='highest', f32
passes) at 1.19x scipy on the 140M-product point and 9.56x at 562M —
~4.5 TFLOP/s, well under MXU peak.  'default' allows bf16 passes
(1 pass instead of the f32 multi-pass decomposition); this measures
the dense product at each precision on the bench shapes, plus the
numerical deviation vs the f32 result.

Usage: python benches/r4/r4_dense_prec.py [--m 15000 --k 25000 --n 15000]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=15000)
    ap.add_argument("--k", type=int, default=25000)
    ap.add_argument("--n", type=int, default=15000)
    ap.add_argument("--density", type=float, default=5e-3)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    out = {"backend": jax.default_backend(), "shape": [args.m, args.k, args.n]}

    def dump():
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f)
                f.write("\n")

    # health reference (CLAUDE.md discipline)
    x = jnp.asarray(np.random.default_rng(0).random(1 << 20, np.float32))
    f = jax.jit(lambda v: v * 1.01 + 1)
    y = f(x)
    _ = float(np.asarray(y)[0])
    t0 = time.perf_counter()
    for _ in range(20):
        y = f(y)
    _ = float(np.asarray(y)[0])
    out["health_us"] = round((time.perf_counter() - t0) / 20 * 1e6, 1)
    print(f"# health {out['health_us']} us/iter", flush=True)

    rng = np.random.default_rng(0)
    # dense operands with bench-point sparsity applied (the dense path
    # multiplies the densified matrices; zeros don't change MXU cost)
    am = (
        rng.random((args.m, args.k), np.float32)
        * (rng.random((args.m, args.k)) < args.density)
    ).astype(np.float32)
    bm = (
        rng.random((args.k, args.n), np.float32)
        * (rng.random((args.k, args.n)) < args.density)
    ).astype(np.float32)
    ad = jnp.asarray(am)
    bd = jnp.asarray(bm)
    macs = float(args.m) * args.k * args.n

    ref = None
    for prec in ("highest", "default", "bf16_cast"):
        if prec == "bf16_cast":
            fn = jax.jit(
                lambda a, b: jnp.dot(
                    a.astype(jnp.bfloat16),
                    b.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            )
        else:
            fn = jax.jit(
                lambda a, b, p=prec: jnp.dot(a, b, precision=p)
            )
        c = fn(ad, bd)
        _ = float(np.asarray(c[0, 0]))  # compile + settle
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = c
            for _ in range(args.iters):
                y = fn(ad + 0.0 * y[0, 0], bd)
            _ = float(np.asarray(y[0, 0]))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        tflops = macs * 2 / best / 1e12
        out[f"{prec}_s"] = best
        out[f"{prec}_tflops"] = round(tflops, 2)
        if ref is None:
            ref = np.asarray(c, np.float64)
            out[f"{prec}_rel_err"] = 0.0
        else:
            dev = np.abs(np.asarray(y, np.float64) - ref).max()
            out[f"{prec}_rel_err"] = float(
                dev / (np.abs(ref).max() + 1e-30)
            )
        print(
            f"{prec}: {best*1e3:.1f} ms ({tflops:.1f} TFLOP/s) "
            f"rel_err={out.get(f'{prec}_rel_err'):.2e}",
            flush=True,
        )
        dump()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
