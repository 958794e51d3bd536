"""Block-sparse SpMM benchmark: MXU utilization of the BSR kernels.

Times Y = A @ X for block-sparse A (128x128 blocks) against the dense
matmul at the same shape — the "speed-of-light" for block-sparse is
density x dense-matmul time.  Reports achieved GFLOP/s (counting only
stored blocks, i.e. useful FLOPs) and the utilization relative to the
measured dense matmul rate.

Usage: python benches/bsr_bench.py [--n 4096] [--k 512]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from sprs_tpu.formats.bsr import bsr_from_dense, bsr_spmm_xla
from sprs_tpu.ops.pallas import bsr_spmm_pallas


def chain_time(f, x0, iters=30, reps=3):
    best = float("inf")
    for _ in range(reps):
        y = f(x0)
        _ = float(jnp.asarray(y).reshape(-1)[0])
        t0 = time.perf_counter()
        y = x0
        for _ in range(iters):
            y = f(y)
        _ = float(jnp.asarray(y).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def make_block_sparse(n, bs, density, seed, dtype):
    rng = np.random.default_rng(seed)
    nb = n // bs
    keep = rng.random((nb, nb)) < density
    dense = np.zeros((n, n), np.float32)
    for i, j in zip(*np.nonzero(keep)):
        dense[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs] = (
            rng.standard_normal((bs, bs)).astype(np.float32)
        )
    return bsr_from_dense(dense, bs, dtype=dtype), dense


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    n, k = args.n, args.k
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bs = 128

    # dense matmul reference rate at this shape
    a_dense = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, n)), dtype
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, k)), dtype
    )
    f_dense = jax.jit(
        lambda x: jnp.dot(a_dense, x, preferred_element_type=jnp.float32).astype(dtype)
    )
    t_dense = chain_time(f_dense, x)
    dense_gflops = 2 * n * n * k / t_dense / 1e9
    out = {"n": n, "k": k, "dtype": args.dtype,
           "dense_matmul_GFLOPs": round(dense_gflops, 1),
           "points": []}

    for density in (0.125, 0.25, 0.5):
        bsr, _ = make_block_sparse(n, bs, density, 2, dtype)
        useful_flops = 2 * bsr.n_blocks * bs * bs * k
        fp = jax.jit(lambda x, b=bsr: bsr_spmm_pallas(b, x).astype(dtype))
        fx = jax.jit(lambda x, b=bsr: bsr_spmm_xla(b, x).astype(dtype))
        tp = chain_time(fp, x)
        tx = chain_time(fx, x)
        point = {
            "block_density": density,
            "n_blocks": bsr.n_blocks,
            "pallas_GFLOPs": round(useful_flops / tp / 1e9, 1),
            "xla_GFLOPs": round(useful_flops / tx / 1e9, 1),
            # ideal time = density * dense time; utilization vs that
            "pallas_vs_ideal": round(density * t_dense / tp, 3),
            "pallas_vs_dense_speedup": round(t_dense / tp, 3),
        }
        out["points"].append(point)
        print(json.dumps(point), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
