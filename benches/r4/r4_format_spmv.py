"""Format-dispatch SpMV battery: ELL / CSR / DIA (+ BSR SpMM) fresh
fori-fused numbers — the round-1 measurement debt named in the round-3
verdict (#7).

Matrices chosen to hit each dispatch arm of ``ops.prepare_spmv``
(prod.py:62-110):

* banded   — 2048² grid Laplacian (5 diags)  → DIA arm
* random   — n=2M, ~8 nnz/row uniform        → ELL arm (low padding)
* skewed   — n=2M, power-law rows            → CSR segment-sum arm
* blocked  — 128² dense blocks               → BSR SpMM vs dense twin

Methodology per CLAUDE.md: health reference first, fori-fused chained
timing, one process, within-process comparisons only.

Usage: python benches/r4/r4_format_spmv.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sprs_tpu as st
from sprs_tpu.ops.prod import prepare_spmv, spmv
from sprs_tpu.utils.special import grid_laplacian


def fori_time(step, operands, x0, inner=16, rounds=3):
    """Fused fori chain: one dispatch per `inner` iterations.

    ``operands`` (the prepared matrix pytree) is a jit ARGUMENT —
    closing over it embeds up to ~100 MB of HLO constants (CLAUDE.md
    remote-compile cliff)."""

    @jax.jit
    def run(ops, v):
        return jax.lax.fori_loop(0, inner, lambda i, a: step(ops, a), v)

    y = run(operands, x0)
    _ = float(jnp.asarray(y).reshape(-1)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        y = run(operands, y)
        _ = float(jnp.asarray(y).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def norm_step(fn, n):
    def step(ops, v):
        y = fn(ops, v[:n])
        return jnp.pad(y / (1.0 + jnp.abs(y[0])), (0, v.shape[0] - n))

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--n", type=int, default=1 << 21)
    ap.add_argument("--side", type=int, default=2048)
    args = ap.parse_args()
    out = {"backend": jax.default_backend()}

    def dump():
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f)
                f.write("\n")

    x0 = jnp.asarray(np.random.default_rng(0).random(1 << 20, np.float32))
    h = fori_time(lambda _, v: v * 1.01 + 1.0, jnp.zeros(1), x0)
    out["health_us"] = round(h * 1e6, 1)
    print(f"# health {h*1e6:.0f} us/iter (fori)", flush=True)

    rng = np.random.default_rng(1)
    n = args.n

    def rand_csr_rows(row_nnz):
        import scipy.sparse as sp

        rows = np.repeat(np.arange(n), row_nnz)
        cols = rng.integers(0, n, rows.shape[0])
        vals = rng.random(rows.shape[0], np.float32)
        m = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
        m.sum_duplicates()
        return st.from_scipy(m)

    cases = {}
    side = args.side
    cases["banded"] = grid_laplacian((side, side), dtype=np.float32)
    cases["random8"] = rand_csr_rows(np.full(n, 8))
    pl = np.minimum((rng.pareto(1.1, n) + 1).astype(np.int64), 512)
    cases["skewed"] = rand_csr_rows(pl)

    for name, mat in cases.items():
        nr = mat.shape[0]
        xv = jnp.asarray(
            np.random.default_rng(2).random(max(nr, mat.shape[1]), np.float32)
        )
        fn, prepared = prepare_spmv(mat)
        kind = type(prepared).__name__
        t = fori_time(
            norm_step(fn, mat.shape[1]), prepared, xv[: mat.shape[1]]
        )
        useful = (int(mat.nnz) * 8 + nr * 8) / 1e9
        out[f"{name}_dispatch"] = kind
        out[f"{name}_ms"] = round(t * 1e3, 3)
        out[f"{name}_gbps"] = round(useful / t, 1)
        print(
            f"{name}: dispatch={kind} {t*1e3:.3f} ms "
            f"({useful/t:.0f} GB/s useful, nnz={int(mat.nnz)})",
            flush=True,
        )
        # CSR segment-sum reference on the same matrix (the always-
        # correct arm) for dispatch-win quantification
        t_csr = fori_time(
            norm_step(lambda m, v: spmv(m, v), mat.shape[1]),
            mat.to_csr(),
            xv[: mat.shape[1]],
        )
        out[f"{name}_csr_ms"] = round(t_csr * 1e3, 3)
        out[f"{name}_dispatch_speedup"] = round(t_csr / t, 2)
        print(
            f"{name}: csr-segsum {t_csr*1e3:.3f} ms "
            f"(dispatch win {t_csr/t:.2f}x)",
            flush=True,
        )
        dump()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
