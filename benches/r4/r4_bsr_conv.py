import time, json
import numpy as np, jax, jax.numpy as jnp
import sprs_tpu as st
from sprs_tpu.utils.rand import rand_csr

x = jnp.asarray(np.random.default_rng(0).random(1 << 20, np.float32))
f = jax.jit(lambda v: v * 1.01 + 1)
y = f(x); _ = float(np.asarray(y)[0])
t0 = time.perf_counter()
for _ in range(20): y = f(y)
_ = float(np.asarray(y)[0])
print(f"health {(time.perf_counter()-t0)/20*1e6:.0f} us/iter", flush=True)

m, k, n, d = 15000, 25000, 15000, 5e-3
a = rand_csr((m, k), d, seed=1)
b = rand_csr((k, n), d, seed=2)
from sprs_tpu.ops.spgemm import _dense_prod
cmat = jax.jit(lambda u, v: _dense_prod(u, v, prec="highest"))(a, b)
cmat.block_until_ready()
r, c = cmat.shape
bs = 128
nbr, nbc = -(-r//bs), -(-c//bs)

# BSR conversion core (fixed block list = all blocks at this density), fori-chained
ids = jnp.arange(nbr*nbc, dtype=jnp.int32)
@jax.jit
def conv_run(cm, carry):
    def body(i, acc):
        pad = jnp.zeros((nbr*bs, nbc*bs), cm.dtype).at[:r, :c].set(cm + acc*0.0)
        t = pad.reshape(nbr, bs, nbc, bs).transpose(0, 2, 1, 3)
        keep = jnp.abs(t).max(axis=(2, 3)) > 0.0
        blocks = t.reshape(nbr*nbc, bs, bs)[ids]
        return acc*0.999 + blocks[0,0,0]*0.0 + keep.sum()*0.0
    return jax.lax.fori_loop(0, 4, body, carry)
y = conv_run(cmat, jnp.ones(())); _ = float(np.asarray(y))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    y = conv_run(cmat, y)
    _ = float(np.asarray(y))
    best = min(best, (time.perf_counter()-t0)/4)
print(f"BSR conversion core: {best*1e3:.1f} ms/conv", flush=True)

# CSR from_dense, fori-chained (cap fixed)
nnz_c = int(jax.jit(lambda v: (v != 0).sum())(cmat))
@jax.jit
def fd_run(cm, carry):
    def body(i, acc):
        mres = st.from_dense(cm + acc*0.0, cap=nnz_c)
        return acc*0.999 + mres.data[0]*0.0
    return jax.lax.fori_loop(0, 2, body, carry)
y = fd_run(cmat, jnp.ones(())); _ = float(np.asarray(y))
best2 = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    y = fd_run(cmat, y)
    _ = float(np.asarray(y))
    best2 = min(best2, (time.perf_counter()-t0)/2)
print(f"from_dense (CSR): {best2*1e3:.1f} ms/conv", flush=True)
print(json.dumps({"bsr_conv_ms": best*1e3, "csr_conv_ms": best2*1e3, "ratio": best2/best}), flush=True)
