"""Same-pattern batch throughput vs the launch floor (round-5 #4).

N small same-pattern problems: one vmapped dispatch vs N device
dispatches vs a scipy host loop.  The point: everything below ~1M
products is dispatch-floor bound on the tunnel chip (~3-8 ms/launch),
so the batch API should turn N small ops into ~one launch.

Stages (each a JSON line):
  spmv:   N=64 SpMVs on a 16k-row Laplacian pattern
  spgemm: N=16 SpGEMMs on a 2k-row random pattern
  ldl:    N=16 refactor+solve on a 4k-row Laplacian (BatchedLdl)
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--stages", default="spmv,spgemm,ldl")
    ap.add_argument("--small", action="store_true", help="CI smoke sizes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import sprs_tpu as st
    from sprs_tpu.ops import batch_spgemm, batch_spmv
    from sprs_tpu.utils.profile import chain_time_best, fetch_scalar
    from sprs_tpu.utils.special import dirichlet_laplacian

    out = {"backend": jax.default_backend(), "stages": {}}

    def dump():
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f)
                f.write("\n")

    f = jax.jit(lambda v: v * 1.01 + 1)
    h = chain_time_best(f, jnp.ones((1 << 20,), jnp.float32), iters=20, rounds=2)
    out["health_ms"] = round(h * 1e3, 3)
    print(f"# health {h*1e3:.3f} ms", flush=True)

    def host_loop_time(fn, iters=3):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    stages = args.stages.split(",")

    # ---------------- batched SpMV ----------------
    if "spmv" in stages:
        N = 8 if args.small else 64
        side = 16 if args.small else 128
        mat = dirichlet_laplacian((side, side), dtype=np.float32)
        n = mat.shape[0]
        rng = np.random.default_rng(0)
        base = np.asarray(mat.data)
        data = jnp.asarray(
            base[None] * (rng.random((N, 1), np.float32) + 0.5)
        )
        x = jnp.asarray(rng.random((N, n), np.float32))

        bat = jax.jit(batch_spmv)
        t_b = chain_time_best(
            lambda xv: bat(mat, data, xv), x, iters=args.iters, rounds=3
        )

        one = jax.jit(lambda d, v: st.spmv(mat.with_data(d), v))

        def loop_step(xv):
            ys = [one(data[i], xv[i]) for i in range(N)]
            return jnp.stack(ys)

        y = loop_step(x)
        _ = fetch_scalar(y)
        t_l = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = loop_step(x)
            _ = fetch_scalar(y)
            t_l = min(t_l, time.perf_counter() - t0)

        import scipy.sparse as sp

        A = sp.csr_matrix(np.asarray(mat.to_dense()))
        xs_h = np.asarray(x)
        ds_h = np.asarray(data)

        def scipy_loop():
            accs = 0.0
            for i in range(N):
                Ai = A.copy()
                Ai.data = Ai.data * (ds_h[i, 0] / base[0])
                accs += Ai @ xs_h[i]
            return accs

        t_s = host_loop_time(scipy_loop)
        out["stages"]["spmv"] = {
            "N": N,
            "n": n,
            "batched_s": t_b,
            "device_loop_s": t_l,
            "scipy_loop_s": t_s,
            "x_vs_device_loop": round(t_l / t_b, 2),
            "x_vs_scipy_loop": round(t_s / t_b, 2),
        }
        print(json.dumps(out["stages"]["spmv"]), flush=True)
        dump()

    # ---------------- batched SpGEMM ----------------
    if "spgemm" in stages:
        N = 4 if args.small else 16
        ns = 256 if args.small else 2048
        rng = np.random.default_rng(1)
        d = (
            rng.standard_normal((ns, ns))
            * (rng.random((ns, ns)) < 0.01 if args.small else rng.random((ns, ns)) < 0.002)
        ).astype(np.float32)
        a = st.from_dense(d)
        prod, ocap = st.spgemm_caps(a, a)
        base = np.asarray(a.data)
        data = jnp.asarray(
            base[None] * (rng.random((N, 1), np.float32) + 0.5)
        )

        bat = jax.jit(
            lambda d1, d2: batch_spgemm(
                a, a, d1, d2, prod_cap=prod, out_cap=ocap
            ).data
        )
        y = bat(data, data)
        _ = fetch_scalar(y)
        t_b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = bat(data, y[:, : data.shape[1]] * 0 + data)
            _ = fetch_scalar(y)
            t_b = min(t_b, (time.perf_counter() - t0) / args.iters)

        import scipy.sparse as sp

        A = sp.csr_matrix(d)

        def scipy_loop():
            acc = 0
            for i in range(N):
                Ai = A.copy()
                Ai.data = Ai.data * float(data[i, 0] / base[0])
                acc += (Ai @ Ai).nnz
            return acc

        t_s = host_loop_time(scipy_loop)
        out["stages"]["spgemm"] = {
            "N": N,
            "n": ns,
            "prod": int(prod),
            "batched_s": t_b,
            "scipy_loop_s": t_s,
            "x_vs_scipy_loop": round(t_s / t_b, 2),
        }
        print(json.dumps(out["stages"]["spgemm"]), flush=True)
        dump()

    # ---------------- batched LDL refactor + solve ----------------
    if "ldl" in stages:
        from sprs_tpu.linalg import Ldl
        from sprs_tpu.ops.batch import batched_ldl_factor

        N = 4 if args.small else 16
        lside = 12 if args.small else 64
        mat = dirichlet_laplacian((lside, lside), dtype=np.float32)
        sym = (
            Ldl().fill_in_reduction("nd").check_symmetry(False).symbolic(mat)
        )
        from sprs_tpu.ops import BatchedLdl

        bl = BatchedLdl(sym)
        a = mat.to_csr()
        rng = np.random.default_rng(2)
        base = np.asarray(a.data)
        data = jnp.asarray(
            base[None] * (rng.random((N, 1), np.float32) + 0.5)
        )

        fac = jax.jit(batched_ldl_factor)
        lx, dd = fac(bl.plan, bl.sched, data)
        _ = fetch_scalar(dd)
        t_b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                lx, dd = fac(bl.plan, bl.sched, data + 0 * dd[0, 0])
            _ = fetch_scalar(dd)
            t_b = min(t_b, (time.perf_counter() - t0) / args.iters)

        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        A = sp.csc_matrix(np.asarray(mat.to_dense(), np.float64))

        def scipy_loop():
            acc = 0.0
            for i in range(N):
                lu = spla.splu(A * float(data[i, 0] / base[0]))
                acc += lu.solve(np.ones(mat.shape[0]))[0]
            return acc

        t_s = host_loop_time(scipy_loop)
        out["stages"]["ldl"] = {
            "N": N,
            "n": mat.shape[0],
            "batched_factor_s": t_b,
            "scipy_splu_loop_s": t_s,
            "x_vs_scipy_loop": round(t_s / t_b, 2),
        }
        print(json.dumps(out["stages"]["ldl"]), flush=True)
        dump()

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
