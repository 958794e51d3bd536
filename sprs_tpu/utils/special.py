"""Special matrix constructors.

* :func:`grid_laplacian` — the 2-D 5-point Laplacian with Dirichlet
  border rows, exactly the structure of the reference heat-diffusion
  example (/root/reference/sprs/examples/heat.rs:45-80: border rows are
  identity rows, interior rows are [4, -1, -1, -1, -1]).
* :func:`tri_mesh_graph_laplacian` — graph Laplacian of a triangle mesh
  (degree on the diagonal, −1 for each undirected edge), mirroring
  special_mats.rs:9-63.
* :func:`dirichlet_laplacian` — the SPD interior 5-point operator
  kron(I,T) + kron(T,I) (T = tridiag(-1,2,-1)); unlike
  :func:`grid_laplacian`, whose identity border rows make it
  NONSYMMETRIC, this one is symmetric positive definite — the right
  operator for CG / IC(0) / LDLᵀ.
"""

from __future__ import annotations

import numpy as np

from ..formats.csmat import CsMat
from ..formats.triplet import TriMat


def grid_laplacian(shape: tuple, dtype=np.float64) -> CsMat:
    """5-point Laplacian on an nx×ny grid with identity boundary rows.

    Vectorized numpy construction (sorted CSR built directly) so
    bench-scale grids (millions of rows) assemble in milliseconds.
    """
    nx, ny = shape
    n = nx * ny
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    interior = (ii > 0) & (ii < nx - 1) & (jj > 0) & (jj < ny - 1)
    row = (ii * ny + jj).ravel()
    interior = interior.ravel()

    rows = [row]
    cols = [row]
    vals = [np.where(interior, 4.0, 1.0)]
    r_int = row[interior]
    for off in (-ny, -1, 1, ny):
        rows.append(r_int)
        cols.append(r_int + off)
        vals.append(np.full(r_int.size, -1.0))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals).astype(dtype)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)

    from ..formats.csmat import csmat

    return csmat(
        (n, n),
        indptr.astype(np.int32),
        cols.astype(np.int32),
        vals,
        validate=False,
    )


def dirichlet_laplacian(shape: tuple, dtype=np.float64) -> CsMat:
    """SPD 5-point Laplacian on the INTERIOR of an nx×ny grid
    (homogeneous Dirichlet conditions eliminated): rows are
    [4, -1, -1, -1, -1] with no boundary identity rows, i.e.
    kron(I, T) + kron(T, I) with T = tridiag(-1, 2, -1)."""
    nx, ny = shape
    n = nx * ny
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    row = (ii * ny + jj).ravel()
    rows = [row]
    cols = [row]
    vals = [np.full(n, 4.0)]
    ii_r = ii.ravel()
    jj_r = jj.ravel()
    for off, ok in (
        (-ny, ii_r > 0),
        (-1, jj_r > 0),
        (1, jj_r < ny - 1),
        (ny, ii_r < nx - 1),
    ):
        r = row[ok]
        rows.append(r)
        cols.append(r + off)
        vals.append(np.full(r.size, -1.0))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals).astype(dtype)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)

    from ..formats.csmat import csmat

    return csmat(
        (n, n),
        indptr.astype(np.int32),
        cols.astype(np.int32),
        vals,
        validate=False,
    )


def tri_mesh_graph_laplacian(n_vertices: int, triangles) -> CsMat:
    """Graph Laplacian of a triangle mesh (special_mats.rs:9-63).

    ``triangles``: (m, 3) integer array.  L[i,i] = degree(i); L[i,j] = −1
    for each mesh edge {i, j}; duplicate edges across triangles count
    once.
    """
    triangles = np.asarray(triangles)
    edges = set()
    for tri in triangles:
        a, b, c = (int(v) for v in tri)
        for u, v in ((a, b), (b, c), (a, c)):
            if u != v:
                edges.add((min(u, v), max(u, v)))
    t = TriMat((n_vertices, n_vertices))
    deg = np.zeros(n_vertices, dtype=np.int64)
    for u, v in sorted(edges):
        t.add_triplet(u, v, -1.0)
        t.add_triplet(v, u, -1.0)
        deg[u] += 1
        deg[v] += 1
    for i in range(n_vertices):
        t.add_triplet(i, i, float(deg[i]))
    return t.to_csr()
