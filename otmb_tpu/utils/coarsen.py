"""LUMP/SPRAY matrix coarsening.

Capability parity with the reference `lump_and_spray`
(src/extratools.jl:38-112): block-coarsen the wet grid by (di, dj, dk),
using the transport operator's sparsity as a connectivity graph so cells
that are not connected (e.g. across a land bridge) are NOT lumped
together; LUMP is made volume-conserving, SPRAY copies coarse values back.

This is host-side preprocessing/analysis tooling (scipy), as the
coarse-matrix workloads (direct solves) are host work; the TPU path uses
the matrix-free solvers in models/solvers.py instead.

Canonical layout: wet3d is (nz, ny, nx); di coarsens the i (lon) axis,
dj the j (lat) axis, dk the k (depth) axis — matching the reference's
(di, dj, dk) meaning on its (nx, ny, nz) arrays.
"""

from __future__ import annotations

import logging

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import connected_components

logger = logging.getLogger(__name__)


def _assign_lump_labels_py(nz, ny, nx, dk, dj, di, wet_ext, lwet_ext, mask,
                           pattern):
    """Pure-Python block labeling (semantics oracle; see the native C++
    core in native/coarsen_native.cpp for the production path)."""
    ez, ey, ex = nz + dk - 1, ny + dj - 1, nx + di - 1
    lump_idx = np.zeros((ez, ey, ex), dtype=np.int64)
    next_id = 2  # 1 is reserved for dry cells (reference extratools.jl:55)
    off_k, off_j, off_i = np.meshgrid(
        np.arange(dk), np.arange(dj), np.arange(di), indexing="ij"
    )
    off_k, off_j, off_i = off_k.ravel(), off_j.ravel(), off_i.ravel()

    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                if lump_idx[k, j, i] > 0 and mask[k, j, i]:
                    continue  # already assigned and inside the region
                if mask[k, j, i]:
                    bk, bj, bi = k + off_k, j + off_j, i + off_i
                    block_wet = wet_ext[bk, bj, bi]
                    lump_idx[bk[~block_wet], bj[~block_wet], bi[~block_wet]] = 1
                    wk, wj, wi = bk[block_wet], bj[block_wet], bi[block_wet]
                    widx = lwet_ext[wk, wj, wi]
                    if widx.size == 0:
                        continue
                    local = pattern[widx][:, widx]
                    ncomp, labels = connected_components(local, directed=False)
                    lump_idx[wk, wj, wi] = next_id + labels
                    next_id += ncomp
                else:
                    lump_idx[k, j, i] = next_id
                    next_id += 1
    return lump_idx, next_id - 1


def _assign_lump_labels_native(nz, ny, nx, dk, dj, di, wet_ext, lwet_ext, mask,
                               pattern):
    """C++ union-find core (native/coarsen_native.cpp); returns None if the
    native library is unavailable."""
    import ctypes

    from ..native import load_library

    lib = load_library("coarsen_native")
    if lib is None:
        return None

    fn = lib.assign_lump_labels
    fn.restype = ctypes.c_int64
    ez, ey, ex = nz + dk - 1, ny + dj - 1, nx + di - 1
    lump_idx = np.zeros((ez, ey, ex), dtype=np.int64)

    wet_u8 = np.ascontiguousarray(wet_ext, dtype=np.uint8)
    lwet_c = np.ascontiguousarray(lwet_ext, dtype=np.int64)
    mask_u8 = np.ascontiguousarray(mask, dtype=np.uint8)
    indptr = np.ascontiguousarray(pattern.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(pattern.indices, dtype=np.int64)

    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_void_p))
    n_ids = fn(
        ctypes.c_int64(nz), ctypes.c_int64(ny), ctypes.c_int64(nx),
        ctypes.c_int64(dk), ctypes.c_int64(dj), ctypes.c_int64(di),
        p(wet_u8), p(lwet_c), p(mask_u8), p(indptr), p(indices), p(lump_idx),
    )
    if n_ids < 0:
        return None
    return lump_idx, int(n_ids)


def lump_and_spray(wet3d, vol, T, mask=None, di: int = 2, dj: int = 2,
                   dk: int = 1, use_native: bool = True):
    """Return (LUMP, SPRAY, vol_c).

    * `wet3d`: (nz, ny, nx) bool.
    * `vol`: length-N wet-cell volume vector (N = wet3d.sum(), C-order).
    * `T`: N x N scipy sparse operator (use
      `utils.sparse_export.coeffs_to_scipy` to get one from stencil
      coefficients); only its sparsity pattern is used.
    * `mask`: optional (nz, ny, nx) bool region; outside it cells are not
      lumped (each keeps its own coarse cell), as in the reference.

    To coarsen a vector: LUMP @ x. To coarsen an operator: LUMP @ T @ SPRAY.
    """
    wet3d = np.asarray(wet3d, bool)
    nz, ny, nx = wet3d.shape
    if mask is None:
        mask = np.ones_like(wet3d)
    else:
        mask = np.asarray(mask, bool)

    ez, ey, ex = nz + dk - 1, ny + dj - 1, nx + di - 1  # ghost-extended shape
    wet_ext = np.zeros((ez, ey, ex), dtype=bool)
    wet_ext[:nz, :ny, :nx] = wet3d

    # Wet linear index in the *extended* grid (reference extratools.jl:46-52).
    lwet_ext = np.full((ez, ey, ex), -1, dtype=np.int64)
    lwet_ext[wet_ext] = np.arange(int(wet_ext.sum()))
    n = int(wet3d.sum())
    assert n == int(wet_ext.sum())

    # Connectivity pattern among wet cells from T (pattern only).
    # T.nonzero() drops explicitly-stored zeros, so its length can be
    # less than T.nnz — size the data array from the indices themselves.
    rows_nz, cols_nz = T.nonzero()
    pattern = sp.csr_matrix(
        (np.ones(len(rows_nz), dtype=bool), (rows_nz, cols_nz)),
        shape=T.shape,
    )
    # Symmetrize so components do not depend on flow direction.
    pattern = (pattern + pattern.T).tocsr()

    result = None
    if use_native:
        result = _assign_lump_labels_native(
            nz, ny, nx, dk, dj, di, wet_ext, lwet_ext, mask, pattern
        )
    if result is None:
        result = _assign_lump_labels_py(
            nz, ny, nx, dk, dj, di, wet_ext, lwet_ext, mask, pattern
        )
    lump_idx, n_ids = result

    # Drop ghost cells; map original cells -> lump ids
    # (reference extratools.jl:85).
    ids = lump_idx[:nz, :ny, :nx].ravel()
    ncells = ids.size
    lump_full = sp.csr_matrix(
        (np.ones(ncells), (ids - 1, np.arange(ncells))),
        shape=(n_ids, ncells),
    )

    wet = wet3d.ravel()
    wet_c = np.asarray(lump_full @ wet.astype(float)).ravel() > 0
    lump = lump_full[wet_c][:, wet]

    vol = np.asarray(vol, dtype=np.float64).ravel()
    vol_c = np.asarray(lump @ vol).ravel()
    lump = sp.diags(1.0 / vol_c) @ lump @ sp.diags(vol)

    spray = lump.T.tocsr().copy()
    spray.data = np.ones_like(spray.data)

    nwet_c = lump.shape[0]
    logger.info(
        "LUMP and SPRAY: matrix size reduction %.0f%% (%d -> %d)",
        100 * (1 - nwet_c / n), n, nwet_c,
    )
    return lump.tocsr(), spray, vol_c


def ideal_age_coarsened(
    coeffs,
    indices,
    topology,
    v3d,
    mask=None,
    di: int = 2,
    dj: int = 2,
    dk: int = 1,
    surface_rate: float = 1.0,
):
    """The reference's headline downstream workload, end to end
    (test/local_full.jl:151-188): export T to a host sparse matrix,
    LUMP/SPRAY-coarsen it, build the coarse surface-restoring mask
    M_c = diag(LUMP @ 1_surface > 0), solve the coarse steady state

        (T_c + M_c) gamma_c = LUMP @ 1

    with a sparse direct solve, and SPRAY the ages back to the fine grid.

    Host-side analysis tooling (scipy spsolve) by design — the coarse
    direct solve is exactly what the reference does on a laptop; the TPU
    path for the same physics is `models.solvers.ideal_age` (matrix-free,
    full resolution). Returns `(gamma3d_seconds, gamma_c_seconds, vol_c)`.
    """
    from scipy.sparse.linalg import spsolve

    from ..grid.indices import as3d, wet_vector
    from .sparse_export import coeffs_to_scipy

    T = coeffs_to_scipy(coeffs, indices, topology)
    wet = np.asarray(indices.wet3d, bool)
    v = wet_vector(np.nan_to_num(np.asarray(v3d, dtype=np.float64)), indices)

    lump, spray, vol_c = lump_and_spray(
        wet, v, T, mask=mask, di=di, dj=dj, dk=dk
    )

    # surface mask (reference local_full.jl:154-163): k = 0 layer
    issrf3d = wet.copy()
    issrf3d[1:] = False
    issrf = wet_vector(issrf3d.astype(np.float64), indices)

    T_c = (lump @ T @ spray).tocsc()
    issrf_c = np.asarray(lump @ issrf).ravel() > 0
    M_c = sp.diags(surface_rate * issrf_c.astype(np.float64))
    s_c = np.asarray(lump @ np.ones(T.shape[0])).ravel()

    gamma_c = spsolve((T_c + M_c).tocsc(), s_c)
    gamma = np.asarray(spray @ gamma_c).ravel()
    return as3d(gamma, wet), gamma_c, vol_c
