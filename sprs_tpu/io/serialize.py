"""Binary persistence with validation on load.

The reference serializes matrices with serde and re-validates every
structural invariant on deserialize so corrupted/adversarial payloads are
rejected (/root/reference/sprs/src/sparse.rs:86-93, sparse/serde_traits.rs,
sprs-tests/tests/tests.rs).  The TPU-native equivalent is an ``.npz``
container (host-side) whose loader routes through the checked
constructors — the same validator the eager API uses — plus enough
metadata (shape, storage, capacity) to reconstruct the padded pytree
exactly, making this the checkpoint format for solver state.
"""

from __future__ import annotations

from typing import Union

import numpy as np

from ..errors import StructureError
from ..formats.csmat import CsMat, csmat
from ..formats.csvec import CsVec, csvec

_MAT_FIELDS = ("indptr", "indices", "data", "shape", "storage", "cap")


def save_npz(path: str, mat: Union[CsMat, CsVec]) -> None:
    if isinstance(mat, CsMat):
        np.savez(
            path,
            format="csmat",
            indptr=np.asarray(mat.indptr),
            indices=np.asarray(mat.indices),
            data=np.asarray(mat.data),
            shape=np.asarray(mat.shape),
            storage=mat.storage,
            cap=mat.cap,
        )
    elif isinstance(mat, CsVec):
        np.savez(
            path,
            format="csvec",
            indices=np.asarray(mat.indices),
            data=np.asarray(mat.data),
            nnz=int(mat.nnz),
            dim=mat.dim,
            cap=mat.cap,
        )
    else:
        raise TypeError(f"cannot serialize {type(mat)}")


def load_npz(path: str) -> Union[CsMat, CsVec]:
    """Load and re-validate (invalid payloads raise StructureError)."""
    with np.load(path, allow_pickle=False) as z:
        fmt = str(z["format"])
        if fmt == "csmat":
            shape = tuple(int(s) for s in z["shape"])
            cap = int(z["cap"])
            indptr = z["indptr"]
            indices = z["indices"]
            data = z["data"]
            if indices.shape[0] != cap or data.shape[0] != cap:
                raise StructureError.size_mismatch(
                    "stored capacity does not match arrays"
                )
            nnz = int(indptr[-1]) if indptr.size else 0
            m = csmat(
                shape,
                indptr,
                indices[:nnz],
                data[:nnz],
                storage=str(z["storage"]),
                cap=cap,
                validate=True,  # the whole point: reject bad payloads
            )
            return m
        if fmt == "csvec":
            nnz = int(z["nnz"])
            cap = int(z["cap"])
            if nnz > cap:
                raise StructureError.size_mismatch("nnz exceeds capacity")
            return csvec(
                int(z["dim"]),
                z["indices"][:nnz],
                z["data"][:nnz],
                cap=cap,
                validate=True,
            )
        raise StructureError.size_mismatch(f"unknown format {fmt!r}")
