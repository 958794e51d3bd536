"""Dispatch-level BSR SpGEMM at the 140M-product point (round-5 #2).

One call — ``spgemm(a, b, method='auto', out_format='auto')`` — must
hit the predicted ~0.16-0.49 s (bf16/f32) at (15000,25000) @ d=5e-3
where the CSR-emitting dense path pays a 2 s compaction and scipy ~3 s.
Also times the chained consumer: (A@B) @ C with the BSR product fed
straight back through ``matmul``.

The BSR path host-fetches the block mask per call (concrete-only), so
timing is per-call wall after a warm call, min over repeats; the
~100-150 ms tunnel per-call artifact is noted in the JSON.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=15000)
    ap.add_argument("--k", type=int, default=25000)
    ap.add_argument("--n", type=int, default=15000)
    ap.add_argument("--density", type=float, default=5e-3)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--precision", default="default", help="default=bf16 passes")
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-scipy", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import sprs_tpu as st
    from sprs_tpu.formats import BsrMat
    from sprs_tpu.utils.profile import chain_time_best, fetch_scalar
    from sprs_tpu.utils.rand import rand_csr

    out = {
        "backend": jax.default_backend(),
        "shape": [args.m, args.k, args.n],
        "density": args.density,
        "precision": args.precision,
    }

    def dump():
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f)
                f.write("\n")

    f = jax.jit(lambda v: v * 1.01 + 1)
    h = chain_time_best(f, jnp.ones((1 << 20,), jnp.float32), iters=20, rounds=2)
    out["health_ms"] = round(h * 1e3, 3)
    print(f"# health {h*1e3:.3f} ms", flush=True)

    a = rand_csr(
        (args.m, args.k), args.density, seed=0, dtype=np.float32
    )
    b = rand_csr(
        (args.k, args.n), args.density, seed=1, dtype=np.float32
    )
    prod = int(
        np.diff(np.asarray(b.indptr))[
            np.asarray(a.indices)[: int(a.nnz)]
        ].sum()
    )
    out["products"] = prod
    print(f"# products {prod/1e6:.1f}M", flush=True)

    # one dispatch-level call, warm then timed
    def call():
        c = st.spgemm(
            a, b, method="auto", out_format="auto",
            precision=args.precision,
        )
        assert isinstance(c, BsrMat), type(c)
        _ = fetch_scalar(c.blocks)
        return c

    t0 = time.perf_counter()
    c = call()
    out["first_call_s"] = time.perf_counter() - t0
    out["n_blocks"] = int(c.n_blocks)
    out["block_density"] = float(c.block_density)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        c = call()
        best = min(best, time.perf_counter() - t0)
    out["dispatch_bsr_s"] = best
    print(
        f"spgemm(auto,out=auto)->BSR: {best:.3f} s "
        f"({out['n_blocks']} blocks, density {out['block_density']:.3f})",
        flush=True,
    )
    dump()

    # chained consumer: (A@B) @ x and (A@B) @ C
    x = jnp.asarray(
        np.random.default_rng(2).random((args.n, 64), np.float32)
    )
    from sprs_tpu.formats import bsr_spmm_xla

    spmm = jax.jit(bsr_spmm_xla)
    y = spmm(c, x)
    _ = fetch_scalar(y)
    t_spmm = chain_time_best(
        lambda v: spmm(c, v * 1.000001), x, iters=5, rounds=3
    )
    out["chained_spmm_s"] = t_spmm
    print(f"BSR @ dense(64): {t_spmm*1e3:.1f} ms", flush=True)
    dump()

    if not args.skip_scipy:
        import scipy.sparse as sp

        nnz_a = int(a.nnz)
        ip = np.asarray(a.indptr).astype(np.int64)
        A = sp.csr_matrix(
            (
                np.asarray(a.data)[:nnz_a],
                np.asarray(a.indices)[:nnz_a].astype(np.int64),
                ip,
            ),
            shape=a.shape,
        )
        nnz_b = int(b.nnz)
        ipb = np.asarray(b.indptr).astype(np.int64)
        B = sp.csr_matrix(
            (
                np.asarray(b.data)[:nnz_b],
                np.asarray(b.indices)[:nnz_b].astype(np.int64),
                ipb,
            ),
            shape=b.shape,
        )
        best_s = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            C = A @ B
            best_s = min(best_s, time.perf_counter() - t0)
        out["scipy_s"] = best_s
        out["scipy_nnz"] = int(C.nnz)
        out["x_vs_scipy"] = round(best_s / out["dispatch_bsr_s"], 2)
        print(
            f"scipy: {best_s:.3f} s -> {out['x_vs_scipy']}x",
            flush=True,
        )
        # sampled equality vs scipy
        rng = np.random.default_rng(3)
        ii = rng.integers(0, args.m, 200)
        jj = rng.integers(0, args.n, 200)
        bs = c.block_size
        got = np.zeros(200, np.float32)
        bh = np.asarray(c.brows)[: c.n_blocks]
        ch = np.asarray(c.bcols)[: c.n_blocks]
        import collections

        bmap = collections.defaultdict(dict)
        for t, (br, bc) in enumerate(zip(bh, ch)):
            bmap[int(br)][int(bc)] = t
        blocks_h = None
        need = sorted(
            {
                bmap[i // bs][j // bs]
                for i, j in zip(ii, jj)
                if (j // bs) in bmap[i // bs]
            }
        )
        sel = np.asarray(c.blocks[jnp.asarray(need, jnp.int32)])
        pos = {t: q for q, t in enumerate(need)}
        for q, (i, j) in enumerate(zip(ii, jj)):
            t = bmap[i // bs].get(j // bs)
            if t is not None:
                got[q] = sel[pos[t], i % bs, j % bs]
        ref = np.asarray(C[ii, jj]).ravel()
        scale = max(np.abs(ref).max(), 1e-9)
        out["sample_rel_err"] = float(np.abs(got - ref).max() / scale)
        print(f"sample rel err {out['sample_rel_err']:.2e}", flush=True)
    print(json.dumps(out), flush=True)
    dump()


if __name__ == "__main__":
    main()
