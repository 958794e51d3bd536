"""Randomized parity fuzzing vs scipy/numpy oracles.

Sweeps random shapes/densities/storages through the op surface and
compares against the host reference — the bulk-randomized complement of
the hand-computed fixture tests (the reference relies on fixtures only;
property-style fuzzing catches the shape/padding edge cases its ASCII
matrices miss).
"""

import numpy as np
import pytest

import sprs_tpu as st

CASES = list(range(12))


def rand_case(seed):
    rng = np.random.default_rng(seed)
    r = int(rng.integers(1, 40))
    c = int(rng.integers(1, 40))
    density = float(rng.uniform(0.02, 0.6))
    d = rng.standard_normal((r, c))
    d[rng.random((r, c)) > density] = 0.0
    storage = "csr" if rng.random() < 0.5 else "csc"
    return rng, d, storage


@pytest.mark.parametrize("seed", CASES)
def test_roundtrip_and_transpose(seed):
    rng, d, storage = rand_case(seed)
    m = st.from_dense(d, storage=storage)
    m.check_structure()
    np.testing.assert_allclose(np.asarray(m.to_dense()), d)
    np.testing.assert_allclose(np.asarray(m.T.to_dense()), d.T)
    np.testing.assert_allclose(
        np.asarray(m.to_other_storage().to_dense()), d
    )


@pytest.mark.parametrize("seed", CASES)
def test_spmv_spmm(seed):
    rng, d, storage = rand_case(seed)
    m = st.from_dense(d, storage=storage)
    x = rng.standard_normal(d.shape[1])
    np.testing.assert_allclose(
        np.asarray(st.spmv(m, x)), d @ x, rtol=1e-10, atol=1e-12
    )
    k = int(rng.integers(1, 6))
    X = rng.standard_normal((d.shape[1], k))
    np.testing.assert_allclose(
        np.asarray(st.spmm(m, X)), d @ X, rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("seed", CASES)
def test_spgemm_vs_scipy(seed):
    rng, d, storage = rand_case(seed)
    e = rng.standard_normal((d.shape[1], int(rng.integers(1, 30))))
    e[rng.random(e.shape) > 0.3] = 0.0
    a = st.from_dense(d, storage=storage)
    b = st.from_dense(e)
    c = st.spgemm(a, b)
    c.check_structure()
    ref = a.to_scipy() @ b.to_scipy()
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref.toarray(), rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("seed", CASES)
def test_spgemm_dense_vs_scipy(seed):
    # the densified-MXU path must agree with scipy up to the
    # documented caveat (exact-cancellation entries dropped) — with
    # random continuous values, cancellation is measure-zero
    rng, d, storage = rand_case(seed)
    e = rng.standard_normal((d.shape[1], int(rng.integers(1, 30))))
    e[rng.random(e.shape) > 0.3] = 0.0
    a = st.from_dense(d, storage=storage)
    b = st.from_dense(e)
    c = st.spgemm_dense(a, b)
    c.to_csr().check_structure()
    ref = a.to_scipy() @ b.to_scipy()
    np.testing.assert_allclose(
        np.asarray(c.to_dense()), ref.toarray(), rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("seed", CASES)
def test_add_sub_mul(seed):
    rng, d, storage = rand_case(seed)
    e = rng.standard_normal(d.shape)
    e[rng.random(d.shape) > 0.3] = 0.0
    a = st.from_dense(d, storage=storage)
    b = st.from_dense(e)
    np.testing.assert_allclose(
        np.asarray((a + b).to_dense()), d + e, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray((a - b).to_dense()), d - e, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray((a * b).to_dense()), d * e, rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("seed", CASES[:6])
def test_formats_roundtrip(seed):
    rng, d, storage = rand_case(seed)
    m = st.from_dense(d)
    np.testing.assert_allclose(np.asarray(m.to_ell().to_dense()), d)
    np.testing.assert_allclose(
        np.asarray(m.to_bsr(8).to_dense()), d, rtol=1e-6
    )
    dia = m.to_dia()
    np.testing.assert_allclose(np.asarray(dia.to_dense()), d, rtol=1e-6)


@pytest.mark.parametrize("seed", CASES[:6])
def test_triplet_duplicates(seed):
    rng = np.random.default_rng(seed + 100)
    r, c = int(rng.integers(2, 20)), int(rng.integers(2, 20))
    n = int(rng.integers(1, 60))
    rows = rng.integers(0, r, n)
    cols = rng.integers(0, c, n)
    vals = rng.standard_normal(n)
    m = st.TriMat.from_triplets((r, c), rows, cols, vals).to_csr()
    m.check_structure()
    ref = np.zeros((r, c))
    np.add.at(ref, (rows, cols), vals)
    np.testing.assert_allclose(
        np.asarray(m.to_dense()), ref, rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("seed", CASES[:6])
def test_permutations(seed):
    rng, d, storage = rand_case(seed)
    m = st.from_dense(d, storage=storage)
    p = st.Permutation.from_array(
        np.random.default_rng(seed).permutation(d.shape[0]).astype(np.int32)
    )
    perm_rows = np.asarray(st.permute_rows(m, p).to_dense())
    np.testing.assert_allclose(perm_rows, d[np.asarray(p.perm)], rtol=1e-10)


@pytest.mark.parametrize("seed", CASES[:8])
def test_reductions_and_elementwise_methods(seed):
    rng, d, storage = rand_case(seed)
    m = st.from_dense(d, storage=storage)
    np.testing.assert_allclose(float(m.sum()), d.sum(), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(m.sum(axis=1)), d.sum(1), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(m.sum(axis=0)), d.sum(0), rtol=1e-10, atol=1e-12
    )
    d2 = rng.standard_normal(d.shape) * (rng.random(d.shape) < 0.4)
    b = st.from_dense(d2, storage=storage)
    np.testing.assert_allclose(
        np.asarray(m.multiply(b).to_dense()), d * d2, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(m.maximum(b).to_dense()),
        np.maximum(d, d2),
        rtol=1e-10,
    )


@pytest.mark.parametrize("seed", CASES[:6])
def test_row_col_vs_dense(seed):
    rng, d, storage = rand_case(seed)
    m = st.from_dense(d, storage=storage)
    i = int(rng.integers(0, d.shape[0]))
    j = int(rng.integers(0, d.shape[1]))
    np.testing.assert_allclose(
        np.asarray(m.row(i).to_dense()), d[i], rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(m.col(j).to_dense()), d[:, j], rtol=1e-10
    )


@pytest.mark.parametrize("seed", CASES[:6])
def test_bsr_conversion_vs_dense(seed):
    rng, d, storage = rand_case(seed)
    m = st.from_dense(d, storage=storage)
    for bs in (4, 8):
        b = m.to_bsr(bs)
        np.testing.assert_allclose(
            np.asarray(b.to_dense()), d, rtol=1e-10
        )


@pytest.mark.parametrize("seed", CASES[:8])
def test_spgemm_batched_sort_vs_flat(seed):
    """Batched segment sort (random targets) bit-matches scipy."""
    from importlib import import_module

    sg = import_module("sprs_tpu.ops.spgemm")
    rng = np.random.default_rng(100 + seed)
    r = int(rng.integers(5, 120))
    k = int(rng.integers(5, 120))
    c = int(rng.integers(5, 120))
    da = rng.standard_normal((r, k))
    da[rng.random((r, k)) > 0.2] = 0.0
    db = rng.standard_normal((k, c))
    db[rng.random((k, c)) > 0.2] = 0.0
    a = st.from_dense(da)
    b = st.from_dense(db)
    target = int(rng.integers(1, 200))
    old = sg.SORT_BATCH_MIN
    sg.SORT_BATCH_MIN = 1
    try:
        batches = sg.spgemm_sort_batches(a, b, target=target)
        out = sg.spgemm(a, b, sort_batches=batches)
    finally:
        sg.SORT_BATCH_MIN = old
    np.testing.assert_allclose(
        np.asarray(out.to_dense()), da @ db, rtol=1e-5, atol=1e-8
    )


@pytest.mark.parametrize("seed", CASES[:4])
def test_dist_spgemm_bgather_fuzz(seed):
    """bgather schedule vs dense oracle on random sparsity."""
    import jax
    from jax.sharding import Mesh

    from sprs_tpu.parallel import (
        dist_spgemm_bgather,
        plan_b_gather,
        shard_csr_rows,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(8, 60))
    m = int(rng.integers(8, 60))
    da = rng.standard_normal((n, m))
    da[rng.random((n, m)) > 0.15] = 0.0
    db = rng.standard_normal((m, n))
    db[rng.random((m, n)) > 0.15] = 0.0
    A = shard_csr_rows(st.from_dense(da), 4)
    B = shard_csr_rows(st.from_dense(db), 4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("shards",))
    out = dist_spgemm_bgather(
        A, B, mesh, plan=plan_b_gather(A, B)
    ).to_csmat()
    np.testing.assert_allclose(
        np.asarray(out.to_dense()), da @ db, rtol=1e-5, atol=1e-6
    )
