"""Export the stencil operator to a scipy sparse matrix over wet cells.

This reproduces the reference's user-facing artifact — a SparseMatrixCSC
over the N wet cells (matrixbuilding.jl:41 etc.) — from the TPU-native
stencil-coefficient representation, for validation and for downstream host
tools (direct solves, coarsening).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..grid.indices import Indices
from ..grid.topology import DIRECTIONS, GridTopology
from ..ops.coeffs import StencilCoeffs


def neighbor_index_map(direction: str, topo: GridTopology) -> np.ndarray:
    """(nz, ny, nx) linear index of each cell's neighbor, -1 where none.

    Numpy mirror of the topology shift semantics (grid/topology.py), used
    only for host-side export.
    """
    nz, ny, nx = topo.shape3d
    idx = np.arange(nz * ny * nx, dtype=np.int64).reshape(nz, ny, nx)
    out = np.full_like(idx, -1)
    if direction == "east":
        out = np.roll(idx, -1, axis=-1)
    elif direction == "west":
        out = np.roll(idx, 1, axis=-1)
    elif direction == "north":
        out[:, :-1, :] = idx[:, 1:, :]
        if topo.is_tripolar:
            out[:, -1, :] = idx[:, -1, ::-1]
    elif direction == "south":
        out[:, 1:, :] = idx[:, :-1, :]
    elif direction == "bottom":
        out[:-1] = idx[1:]
    elif direction == "top":
        out[1:] = idx[:-1]
    else:
        raise ValueError(direction)
    return out


def coeffs_to_scipy(
    coeffs: StencilCoeffs, indices: Indices, topo: GridTopology
) -> sp.csr_matrix:
    """Assemble the N x N wet-cell sparse matrix equal to the stencil
    operator. Row/column order is the wet-linear order of `indices`
    (C-order over (nz, ny, nx))."""
    n = indices.nwet
    lwet3d_flat = indices.lwet3d.reshape(-1)

    rows, cols, vals = [], [], []

    diag = np.asarray(coeffs.diag).reshape(-1)[indices.lwet]
    rows.append(np.arange(n))
    cols.append(np.arange(n))
    vals.append(diag)

    for d in DIRECTIONS:
        coef = np.asarray(coeffs[d]).reshape(-1)[indices.lwet]
        nb_lin = neighbor_index_map(d, topo).reshape(-1)[indices.lwet]
        has_nb = nb_lin >= 0
        nb_wet_idx = np.where(has_nb, lwet3d_flat[nb_lin], -1)
        active = has_nb & (nb_wet_idx >= 0) & (coef != 0)
        if np.any(active & (nb_wet_idx < 0)):
            raise AssertionError("nonzero coefficient pointing at a dry cell")
        rows.append(np.flatnonzero(active))
        cols.append(nb_wet_idx[active])
        vals.append(coef[active])

    mat = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    )
    mat.sum_duplicates()
    return mat
