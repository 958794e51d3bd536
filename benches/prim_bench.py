"""Chained primitive micro-benchmarks with a health gate.

Methodology distilled from round-1 measurement work (CLAUDE.md):

* Every timing is a dependency chain ``y = f(y)`` ending in one scalar
  fetch — independent repeated calls through the axon tunnel carry a
  ~100-150 ms per-call artifact that swamps any kernel.
* A trivial elementwise op is timed FIRST as the health reference; the
  tunnel has degraded states (trivial op 60-150 ms/iter vs sub-ms
  healthy) in which absolute numbers are garbage.  The gate aborts (or
  annotates) rather than record nonsense.
* Primitives measured relative to the trivial op: batched dim-1 sort,
  global 1-D sort, gather, scatter-add, cumsum — the building blocks
  of every sparse kernel in this library.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python benches/prim_bench.py
Run on CPU:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benches/prim_bench.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 5_600_000
B = N // 128


def chain(f, x0, iters=10, rounds=3):
    # canonical fetch-terminated chained timer (device-side scalar
    # index — a host np.asarray here would drag the whole array through
    # the tunnel inside the timed window)
    from sprs_tpu.utils.profile import chain_time_best

    return chain_time_best(jax.jit(f), x0, iters=iters, rounds=rounds)


def fori(f, x0, inner=16, rounds=3):
    # in-jit fori_loop chain: amortizes the per-DISPATCH tunnel floor
    # (~ms) that a host-side chain still pays once per iteration —
    # the honest number for sub-ms primitives
    from sprs_tpu.utils.profile import fori_chain_time

    return fori_chain_time(
        lambda _, y: f(y), None, x0, inner=inner, rounds=rounds
    )


def main():
    rng = np.random.default_rng(0)
    k2 = jnp.asarray(rng.integers(0, 1 << 30, (B, 128)).astype(np.int32))
    _ = float(np.asarray(k2[0, 0]))
    kf = k2.astype(jnp.float32)
    k1 = k2.reshape(-1)
    idx = k1 % N

    t_ref = chain(lambda a: a * 1.000001 + 0.5, kf)
    healthy = t_ref < 0.01
    out = {
        "n_elements": N,
        "backend": jax.default_backend(),
        "trivial_ms": round(t_ref * 1e3, 3),
        "stream_GBps": round(2 * 4 * N / t_ref / 1e9, 1),
        "healthy": healthy,
    }
    prims = {
        "sort_batched_dim1": (
            lambda a: jax.lax.sort((a,), dimension=1, num_keys=1)[0],
            k2,
        ),
        "sort_1d_global": (
            lambda a: jax.lax.sort((a,), num_keys=1)[0],
            k1,
        ),
        "gather": (lambda i: i[i], idx),
        "scatter_add": (
            lambda i: jnp.zeros(N, jnp.int32).at[i].add(1, mode="drop")
            + i,
            idx,
        ),
        "cumsum": (lambda i: jnp.cumsum(i) % N, idx),
    }
    t_ref_fori = fori(lambda a: a * 1.000001 + 0.5, kf)
    out["trivial_fori_ms"] = round(t_ref_fori * 1e3, 3)
    out["stream_fori_GBps"] = round(2 * 4 * N / t_ref_fori / 1e9, 1)
    for name, (f, x0) in prims.items():
        t = chain(f, x0)
        out[name + "_ms"] = round(t * 1e3, 3)
        out[name + "_vs_trivial"] = round(t / t_ref, 2)
        tf = fori(f, x0)
        out[name + "_fori_ms"] = round(tf * 1e3, 3)
        out[name + "_fori_vs_trivial"] = round(tf / t_ref_fori, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
