"""Mixed-precision iterative refinement: f32 factor + f64 host
residuals must recover f64-class forward accuracy (the TPU-native
answer to cond-amplified f32 direct-solve forward error, BASELINE.md
round 4)."""

import numpy as np
import pytest

import sprs_tpu as st
from sprs_tpu.linalg import Ldl, refine_solve
from sprs_tpu.utils.special import dirichlet_laplacian


def _f64_ref(a, b):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    csr = a.to_csr()
    ip = np.asarray(csr.indptr).astype(np.int64)
    A = sp.csr_matrix(
        (
            np.asarray(csr.data)[: ip[-1]].astype(np.float64),
            np.asarray(csr.indices)[: ip[-1]].astype(np.int64),
            ip,
        ),
        shape=a.shape,
    )
    return spla.spsolve(A.tocsc(), b)


class TestRefineSolve:
    def test_recovers_forward_accuracy_from_f32_factor(self):
        a = dirichlet_laplacian((48, 48))
        n = a.shape[0]
        # force an f32 factor even under the suite's x64 config
        a32 = st.csmat(
            a.shape,
            a.to_csr().indptr,
            a.to_csr().indices,
            np.asarray(a.to_csr().data, np.float32),
            storage="csr",
            validate=False,
        )
        num = (
            Ldl().fill_in_reduction("nd").check_symmetry(False).numeric(a32)
        )
        b = np.linspace(1.0, 2.0, n)
        x_ref = _f64_ref(a, b)
        x0 = np.asarray(num.solve(b.astype(np.float32)), np.float64)
        fe0 = np.abs(x0 - x_ref).max() / np.abs(x_ref).max()
        x, info = refine_solve(a, num, b, steps=3)
        fe = np.abs(x - x_ref).max() / np.abs(x_ref).max()
        assert fe < fe0 / 10
        assert info["backward_errors"][-1] < 1e-13

    def test_early_stop_rtol(self):
        a = dirichlet_laplacian((16, 16))
        num = Ldl().fill_in_reduction("nd").check_symmetry(False).numeric(a)
        b = np.ones(a.shape[0])
        x, info = refine_solve(a, num, b, steps=10, rtol=1e-10)
        assert len(info["backward_errors"]) < 11
        assert info["backward_errors"][-1] < 1e-10

    def test_callable_and_splu(self):
        from sprs_tpu.linalg import splu

        a = dirichlet_laplacian((12, 12))
        lu = splu(a)
        b = np.ones(a.shape[0])
        x, info = refine_solve(a, lu, b, steps=2)
        assert info["backward_errors"][-1] < 1e-13
