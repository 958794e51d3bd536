"""Micro-benchmarks mirroring the reference's bencher suite
(/root/reference/sprs/benches/{suite,sparse_dense_products,sorting}.rs):

* CsVec negation / map
* sparse·dense dot at dim 1e6 with 3 nnz (the skewed-dot case)
* CsVec × CsMat product
* sorted vs unsorted construction (dim 9000, nnz 900)

Usage: python benches/micro_bench.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sprs_tpu as st


def timeit(f, *args, iters=50, reps=3):
    best = float("inf")
    for _ in range(reps):
        o = f(*args)
        _ = float(jnp.asarray(o if not hasattr(o, "data") else o.data).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*args)
        _ = float(jnp.asarray(o if not hasattr(o, "data") else o.data).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend()}

    # csvec neg (suite.rs)
    v = st.csvec(100_000, np.arange(0, 100_000, 10, dtype=np.int32),
                 rng.standard_normal(10_000))
    f = jax.jit(lambda v: (-v).data)
    out["csvec_neg_us"] = round(timeit(f, v) * 1e6, 1)

    # sparse-dense dot, dim 1e6 / nnz 3 (sparse_dense_products.rs)
    sv = st.csvec(1_000_000, np.array([2, 500_000, 999_999], np.int32),
                  np.array([1.0, 2.0, 3.0]))
    dense = jnp.asarray(rng.standard_normal(1_000_000))
    f = jax.jit(lambda v, d: v.dot_dense(d))
    out["sparse_dense_dot_us"] = round(timeit(f, sv, dense) * 1e6, 1)

    # csvec x csmat product
    m = st.utils.rand_csr((10_000, 10_000), 1e-3, seed=1)
    vv = st.csvec_from_dense(
        np.where(rng.random(10_000) < 0.01, rng.standard_normal(10_000), 0.0)
    )
    # eager: vec@mat picks exact capacities host-side per call
    out["csvec_mat_product_us"] = round(
        timeit(lambda v: (v @ m).data, vv, iters=20) * 1e6, 1
    )

    # sorted vs unsorted construction (sorting.rs: dim 9000, nnz 900)
    idx = np.sort(rng.choice(9000, 900, replace=False)).astype(np.int32)
    dat = rng.standard_normal(900)
    t0 = time.perf_counter()
    for _ in range(50):
        st.csvec(9000, idx, dat)
    out["sorted_construction_us"] = round((time.perf_counter() - t0) / 50 * 1e6, 1)
    shuf = rng.permutation(900)
    t0 = time.perf_counter()
    for _ in range(50):
        st.csvec_from_unsorted(9000, idx[shuf], dat[shuf])
    out["unsorted_construction_us"] = round((time.perf_counter() - t0) / 50 * 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
