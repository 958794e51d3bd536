"""140M-product SpGEMM: device-resident chunked pipeline vs scipy.

(15000,25000)@(25000,15000) d=5e-3 — the point where round 1 took 133 s
vs scipy 7.8 s because every chunk round-tripped through the host.
"""
import time
import numpy as np, jax, jax.numpy as jnp
import sprs_tpu as st
from sprs_tpu.utils.rand import rand_csr
from sprs_tpu.utils.profile import chain_time_best
from importlib import import_module

sg = import_module("sprs_tpu.ops.spgemm")
print("backend:", jax.default_backend(), flush=True)

t0 = time.perf_counter()
z = jnp.asarray(np.ones(262144, np.float32))
_ = float(np.asarray(z[7]))
print(f"drain {time.perf_counter()-t0:.1f}s", flush=True)

x8 = jnp.asarray(np.random.default_rng(0).random(8_000_000, dtype=np.float32))
triv = jax.jit(lambda x: x * 1.000001 + 0.5)
from sprs_tpu.utils.profile import chain_time_best as ctb
t_h = ctb(triv, x8, iters=20, rounds=3)
print(f"health 32MB: {t_h*1e3:.3f} ms/iter", flush=True)

a = rand_csr((15000, 25000), 5e-3, seed=0, dtype=np.float32)
b = rand_csr((25000, 15000), 5e-3, seed=1, dtype=np.float32)
prod = sg._exact_prod_count(a, b)
print("products:", prod, flush=True)

a_sp = a.to_scipy().tocsr(); b_sp = b.to_scipy().tocsr()
best_scipy = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    c_ref = a_sp @ b_sp
    best_scipy = min(best_scipy, time.perf_counter() - t0)
print(f"scipy best-of-3: {best_scipy:.2f} s (nnz_c {c_ref.nnz})", flush=True)

# native Gustavson second baseline
from sprs_tpu import native
if native.available():
    t0 = time.perf_counter()
    cp, ci, cv = native.spgemm_host(
        a_sp.indptr, a_sp.indices, a_sp.data,
        b_sp.indptr, b_sp.indices, b_sp.data, b_sp.shape[1])
    t_nat = time.perf_counter() - t0
    print(f"native gustavson: {t_nat:.2f} s (nnz {cp[-1]})", flush=True)

for trial in range(2):
    t0 = time.perf_counter()
    c = sg.spgemm(a, b)  # concrete path -> _spgemm_chunked
    nnz = int(c.nnz)
    # force full materialization honestly
    _ = float(jnp.asarray(c.data).reshape(-1)[0])
    dt = time.perf_counter() - t0
    print(f"tpu chunked trial {trial}: {dt:.2f} s  nnz {nnz}  "
          f"ratio vs scipy {best_scipy/dt:.2f}x", flush=True)

# densified-MXU path (spgemm auto picks it at this density) — same
# process so the ratio is trustworthy
out_cap = max(int(c_ref.nnz), 1)
f_dense = None
try:
    import jax
    f_dense = jax.jit(lambda a, b: sg.spgemm_dense(a, b, out_cap=out_cap))
    cd = f_dense(a, b)
    _ = float(jnp.asarray(cd.data).reshape(-1)[0])  # compile+settle
    for trial in range(3):
        t0 = time.perf_counter()
        cd = f_dense(a, b)
        _ = float(jnp.asarray(cd.data).reshape(-1)[0])
        dt_d = time.perf_counter() - t0
        print(f"tpu dense-mxu trial {trial}: {dt_d:.2f} s  "
              f"ratio vs scipy {best_scipy/dt_d:.2f}x", flush=True)
except Exception as e:
    print(f"dense path failed: {e}", flush=True)

# correctness spot check (sampled rows)
rows = np.random.default_rng(2).choice(15000, 50, replace=False)
ok = True
c_host_ip = np.asarray(c.indptr); c_host_ix = np.asarray(c.indices); c_host_dt = np.asarray(c.data)
import scipy.sparse as sp
c_sp = sp.csr_matrix((c_host_dt[:nnz], c_host_ix[:nnz], c_host_ip), shape=(15000, 15000))
for r in rows:
    d1 = np.asarray(c_sp[r].todense()).ravel()
    d2 = np.asarray(c_ref[r].todense()).ravel()
    if not np.allclose(d1, d2, rtol=1e-4, atol=1e-5):
        ok = False
        print("row mismatch", r, np.abs(d1-d2).max(), flush=True)
        break
print("sampled equality:", ok, flush=True)
print("=== done ===", flush=True)
