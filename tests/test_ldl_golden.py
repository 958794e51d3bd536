"""LDLᵀ golden-value parity with the reference fixture.

The exact 10×10 SPD matrix, expected L/D factors (as f64 doubles), and
solve result from /root/reference/sprs-ldl/src/lib.rs:634-745
(test_mat1/expected_factors1/expected_res1).  The factors must match to
f64 roundoff — same algorithm, same ordering, same arithmetic.
"""

import numpy as np

import sprs_tpu as st
from sprs_tpu.linalg import Ldl

# test_mat1 (lib.rs:634-647): CSC 10x10
INDPTR = [0, 2, 5, 6, 7, 13, 14, 17, 20, 24, 28]
INDICES = [0, 8, 1, 4, 9, 2, 3, 1, 4, 6, 7, 8, 9, 5, 4, 6, 9, 4, 7, 8, 0,
           4, 7, 8, 1, 4, 6, 9]
DATA = [1.7, 0.13, 1.0, 0.02, 0.01, 1.5, 1.1, 0.02, 2.6, 0.16, 0.09, 0.52,
        0.53, 1.2, 0.16, 1.3, 0.56, 0.09, 1.6, 0.11, 0.13, 0.52, 0.11, 1.4,
        0.01, 0.53, 0.56, 3.1]
VEC = [0.287, 0.22, 0.45, 0.44, 2.486, 0.72, 1.55, 1.424, 1.621, 3.759]

# expected_factors1 (lib.rs:655-686): off-diagonal L in CSC, D diagonal
EXP_LP = [0, 1, 3, 3, 3, 7, 7, 10, 12, 13, 13]
EXP_LI = [8, 4, 9, 6, 7, 8, 9, 7, 8, 9, 8, 9, 9]
EXP_LX = [0.076470588235294124, 0.02, 0.01, 0.061547930450838589,
          0.034620710878596701, 0.20003077396522542, 0.20380058470533929,
          -0.0042935346524025902, -0.024807089102770519,
          0.40878266366119237, 0.05752526570865537,
          -0.010068305077340346, -0.071852278207562709]
EXP_D = [1.7, 1.0, 1.5, 1.1000000000000001, 2.5996000000000001, 1.2,
         1.290152331127866, 1.5968603527854308, 1.2799646117414738,
         2.7695677698030283]
EXP_X = [0.099999999999999992, 0.19999999999999998, 0.29999999999999999,
         0.39999999999999997, 0.5, 0.59999999999999998,
         0.70000000000000007, 0.79999999999999993, 0.90000000000000002,
         0.99999999999999989]


def fixture_mat():
    return st.csc((10, 10), INDPTR, INDICES, DATA)


def offdiag_csc(l_mat):
    """Extract (indptr, indices, data) of L's strict lower part per
    column (our L stores the unit diagonal; the fixture omits it)."""
    nnz = int(l_mat.nnz)
    indptr = np.asarray(l_mat.indptr)
    indices = np.asarray(l_mat.indices)[:nnz]
    data = np.asarray(l_mat.data)[:nnz]
    lp, li, lx = [0], [], []
    for c in range(10):
        for p in range(indptr[c], indptr[c + 1]):
            if indices[p] != c:
                li.append(int(indices[p]))
                lx.append(float(data[p]))
        lp.append(len(li))
    return lp, li, lx


class TestGoldenFactor:
    def golden(self, backend):
        num = Ldl().check_symmetry(False).numeric(
            fixture_mat(), backend=backend
        )
        lp, li, lx = offdiag_csc(num.l())
        assert lp == EXP_LP
        assert li == EXP_LI
        np.testing.assert_allclose(lx, EXP_LX, rtol=1e-13)
        np.testing.assert_allclose(
            np.asarray(num.d_diag()), EXP_D, rtol=1e-13
        )
        x = np.asarray(num.solve(np.asarray(VEC)))
        np.testing.assert_allclose(x, EXP_X, rtol=1e-12)

    def test_host_backend(self):
        self.golden("host")

    def test_device_backend(self):
        self.golden("device")

    def test_update_same_pattern(self):
        num = Ldl().check_symmetry(False).numeric(fixture_mat())
        # scale the matrix by 2: L unchanged, D doubles (lib.rs:361-381
        # refactorization semantics)
        m2 = fixture_mat().scale(2.0)
        num2 = num.update(m2)
        _, _, lx = offdiag_csc(num2.l())
        np.testing.assert_allclose(lx, EXP_LX, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(num2.d_diag()), 2 * np.asarray(EXP_D), rtol=1e-12
        )
