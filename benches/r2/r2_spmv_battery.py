"""R2 SpMV battery v2: per-dispatch floor vs in-jit fori_loop chains.

Hypothesis: the tunnel adds a per-DISPATCH floor (~ms) that dominated
every round-1 measurement (health 32MB at 3.4 ms/iter ~ floor, not
bandwidth).  An in-jit fori_loop chain amortizes N kernels per
dispatch and measures true device time.

Matrices are passed as ARGUMENTS (never closed over: HLO-constant
embedding makes 100s-of-MB remote-compile payloads).
"""
import time, functools
import numpy as np, jax, jax.numpy as jnp
import sprs_tpu as st
from sprs_tpu.utils.profile import chain_time_best
from sprs_tpu.ops.pallas import dia_tile

print("backend:", jax.default_backend(), flush=True)

t0 = time.perf_counter()
z = jnp.asarray(np.ones(262144, np.float32))
_ = float(np.asarray(z[7]))
print(f"drain {time.perf_counter()-t0:.1f}s", flush=True)


def fori_time(step2, mat, x0, inner=32, rounds=3):
    """Seconds per step; `inner` steps fused into ONE dispatch.
    step2(mat, y) -> y', mat passed as pytree argument."""

    @jax.jit
    def run(m, x):
        return jax.lax.fori_loop(
            0, inner, lambda i, y: step2(m, y), x
        )

    y = run(mat, x0)
    _ = float(jnp.asarray(y).reshape(-1)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        y = run(mat, x0)
        _ = float(jnp.asarray(y).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


# --- dispatch floor: trivial op at 3 sizes, host-chain vs fori-chain ---
for mb in (1, 32, 512):
    n = mb * (1 << 20) // 4
    x = jnp.asarray(np.random.default_rng(0).random(n, dtype=np.float32))
    t_host = chain_time_best(
        jax.jit(lambda v: v * 1.000001 + 0.5), x, iters=10, rounds=3
    )
    t_fori = fori_time(lambda m, v: v * 1.000001 + 0.5, (), x, inner=32)
    print(
        f"trivial {mb:>3} MB: host-chain {t_host*1e3:7.3f} ms/iter "
        f"({2*mb/1024/t_host:6.1f} GB/s)   fori-chain {t_fori*1e3:7.3f} "
        f"ms/iter ({2*mb/1024/t_fori:6.1f} GB/s)",
        flush=True,
    )

# --- bench matrix ---
lap = st.utils.grid_laplacian((2048, 2048), dtype=np.float32).to_dia()
n = lap.rows
k = lap.n_diags
useful = (k + 2) * n * 4
print(f"matrix: {n} rows, {k} diags, useful {useful>>20} MB/spmv", flush=True)

xv = jnp.asarray(np.random.default_rng(2).random(n, dtype=np.float32))
tm = dia_tile(lap)
print(f"tile: blk={tm.blk} grp={tm.grp}", flush=True)

fl2 = lambda m, v: m.spmv(v, interpret=False)
t_fl_host = chain_time_best(
    functools.partial(jax.jit(fl2), tm), xv, iters=10, rounds=3
)
t_fl_fori = fori_time(fl2, tm, xv, inner=32)
print(
    f"flatg: host {t_fl_host*1e3:.3f} ms ({useful/t_fl_host/1e9:.0f} GB/s)  "
    f"fori {t_fl_fori*1e3:.3f} ms ({useful/t_fl_fori/1e9:.0f} GB/s)",
    flush=True,
)

for depth in (2, 4):
    man2 = lambda m, v, d=depth: m.spmv(
        v, interpret=False, variant="manual", depth=d
    )
    y_m = jax.jit(man2)(tm, xv)
    err = float(jnp.abs(y_m - jax.jit(fl2)(tm, xv)).max())
    t_m = fori_time(man2, tm, xv, inner=32)
    print(
        f"manual d{depth}: fori {t_m*1e3:.3f} ms "
        f"({useful/t_m/1e9:.0f} GB/s)  maxdiff {err:.1e}",
        flush=True,
    )

from sprs_tpu.formats.dia import dia_spmv

t_x = fori_time(lambda m, v: dia_spmv(m, v), lap, xv, inner=32)
print(f"xla dia: fori {t_x*1e3:.3f} ms ({useful/t_x/1e9:.0f} GB/s)", flush=True)
print("=== done ===", flush=True)
