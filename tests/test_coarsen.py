"""LUMP/SPRAY coarsening (reference extratools.jl:38-112 semantics)."""

import numpy as np
import pytest

from otmb_tpu.grid.indices import wet_vector
from otmb_tpu.models.transport import transportmatrix
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.utils.coarsen import lump_and_spray
from otmb_tpu.utils.sparse_export import coeffs_to_scipy


@pytest.fixture(scope="module")
def built(dataset, gridmetrics, indices):
    phi = facefluxesfrommasstransport(
        umo=dataset.umo, vmo=dataset.vmo, gridmetrics=gridmetrics, indices=indices
    )
    ops = transportmatrix(
        phi=phi, mlotst=dataset.mlotst, gridmetrics=gridmetrics, indices=indices
    )
    mat = coeffs_to_scipy(ops.T, indices, gridmetrics.topology)
    return ops, mat


def test_lump_and_spray(built, gridmetrics, indices):
    ops, mat = built
    wet = np.asarray(indices.wet3d)
    v = wet_vector(np.asarray(gridmetrics.v3d), indices)

    lump, spray, v_c = lump_and_spray(wet, v, mat, di=2, dj=2, dk=1)

    n = indices.nwet
    n_c = lump.shape[0]
    assert 0 < n_c < n
    assert spray.shape == (n, n_c)

    # LUMP rows are volume-weighted averages: LUMP @ ones == ones
    ones = np.ones(n)
    np.testing.assert_allclose(np.asarray(lump @ ones).ravel(), 1.0, rtol=1e-12)

    # volume conservation: v_c == LUMP-aggregated volumes; total volume kept
    np.testing.assert_allclose(v_c.sum(), v.sum(), rtol=1e-12)

    # SPRAY scatters each coarse value to all its fine cells
    rng = np.random.default_rng(0)
    x_c = rng.standard_normal(n_c)
    x = np.asarray(spray @ x_c).ravel()
    assert set(np.round(x, 12)) <= set(np.round(x_c, 12))

    # coarse operator conserves volume like the fine one:
    # v_c' (LUMP T SPRAY) ~ 0 (within roundoff of the fine operator)
    t_c = lump @ mat @ spray
    resid = np.abs(v_c @ t_c).max()
    fine_resid = np.abs(v @ mat).max()
    assert resid < 10 * max(fine_resid, 1e-12)


def test_lump_respects_region_mask(built, gridmetrics, indices):
    """Outside the mask no lumping happens (each cell keeps its own coarse
    cell), mirroring the reference's region-restricted coarsening."""
    ops, mat = built
    wet = np.asarray(indices.wet3d)
    v = wet_vector(np.asarray(gridmetrics.v3d), indices)

    mask = np.zeros_like(wet)
    mask[:, : wet.shape[1] // 2, :] = True  # lump only the southern half

    lump_m, spray_m, _ = lump_and_spray(wet, v, mat, mask=mask, di=2, dj=2, dk=2)
    lump, spray, _ = lump_and_spray(wet, v, mat, di=2, dj=2, dk=2)

    # unmasked coarsening lumps strictly more
    assert lump_m.shape[0] > lump.shape[0]

    # every wet cell outside the mask sits alone in its coarse cell
    counts = np.asarray((spray_m > 0).sum(axis=0)).ravel()  # fine cells per coarse
    outside = ~mask[wet.astype(bool)]
    fine_to_coarse = spray_m.tocsr().indices  # since one nonzero per fine row? no
    # simpler: rows of SPRAY have exactly one nonzero (each fine cell has
    # one coarse parent)
    spray_csr = spray_m.tocsr()
    assert np.all(np.diff(spray_csr.indptr) == 1)
    parents = spray_csr.indices
    sizes = np.bincount(parents)
    outside_parents = parents[outside]
    assert np.all(sizes[outside_parents] == 1)


def test_native_matches_python(built, gridmetrics, indices):
    """The C++ labeling core must produce the same partition of fine cells
    into coarse cells as the Python oracle (labels may be permuted)."""
    from otmb_tpu.native import load_library

    assert load_library("coarsen_native") is not None, "native build failed"

    ops, mat = built
    wet = np.asarray(indices.wet3d)
    v = wet_vector(np.asarray(gridmetrics.v3d), indices)

    mask = np.zeros_like(wet)
    mask[:, : wet.shape[1] // 2, :] = True

    for kwargs in (dict(di=2, dj=2, dk=1), dict(di=3, dj=2, dk=2),
                   dict(di=2, dj=2, dk=1, mask=mask)):
        l_py, s_py, v_py = lump_and_spray(wet, v, mat, use_native=False, **kwargs)
        l_c, s_c, v_c = lump_and_spray(wet, v, mat, use_native=True, **kwargs)
        assert l_py.shape == l_c.shape
        # same partition: each fine cell's coarse-group members identical
        parents_py = s_py.tocsr().indices
        parents_c = s_c.tocsr().indices
        # canonical relabel: map parent id -> smallest member fine index
        def canon(parents):
            first = {}
            out = np.empty_like(parents)
            for fine, p in enumerate(parents):
                if p not in first:
                    first[p] = fine
                out[fine] = first[p]
            return out

        np.testing.assert_array_equal(canon(parents_py), canon(parents_c))
        np.testing.assert_allclose(np.sort(v_py), np.sort(v_c), rtol=1e-12)


def test_ideal_age_coarsened_reference_workload(dataset, gridmetrics, indices):
    """The reference's headline downstream workload end to end
    (test/local_full.jl:151-188): LUMP/SPRAY-coarsened direct ideal-age
    solve. Ports the reference's range check (0 < volume-mean age <
    2000 yr) and adds a residual check on the coarse system and
    consistency with the full-resolution matrix-free solve."""
    import scipy.sparse as sp

    from otmb_tpu.models.solvers import ideal_age
    from otmb_tpu.utils.coarsen import ideal_age_coarsened

    phi = facefluxesfrommasstransport(
        umo=dataset.umo, vmo=dataset.vmo, gridmetrics=gridmetrics,
        indices=indices,
    )
    ops = transportmatrix(
        phi=phi, mlotst=dataset.mlotst, gridmetrics=gridmetrics,
        indices=indices,
    )
    gamma3d, gamma_c, vol_c = ideal_age_coarsened(
        ops.T, indices, gridmetrics.topology, gridmetrics.v3d,
        di=2, dj=2, dk=1,
    )
    wet = np.asarray(indices.wet3d)
    assert gamma3d.shape == wet.shape
    assert np.isfinite(gamma3d[wet]).all()
    assert np.isnan(gamma3d[~wet]).all()

    # reference range check (local_full.jl:188), volume-weighted mean age
    yr = 365.25 * 86400.0
    v = wet_vector(np.nan_to_num(np.asarray(gridmetrics.v3d)), indices)
    mean_age_yr = float(v @ gamma3d[wet]) / float(v.sum()) / yr
    assert 0.0 < mean_age_yr < 2000.0

    # the coarse direct solve actually solved its system
    mat = coeffs_to_scipy(ops.T, indices, gridmetrics.topology)
    lump, spray, _ = lump_and_spray(wet, v, mat, di=2, dj=2, dk=1)
    t_c = (lump @ mat @ spray).tocsc()
    issrf = wet.copy()
    issrf[1:] = False
    issrf_c = np.asarray(
        lump @ wet_vector(issrf.astype(float), indices)
    ).ravel() > 0
    m_c = sp.diags(issrf_c.astype(float))
    s_c = np.asarray(lump @ np.ones(mat.shape[0])).ravel()
    res = np.linalg.norm((t_c + m_c) @ gamma_c - s_c) / np.linalg.norm(s_c)
    assert res < 1e-8

    # sprayed field is constant within each lump
    spread = np.asarray(spray @ gamma_c).ravel()
    assert np.allclose(spread, gamma3d[wet], rtol=0, atol=0)

    # consistent with the full-resolution matrix-free solve: coarsening
    # changes the operator, so only require same order of magnitude
    gamma_full, res_full = ideal_age(
        ops.T, indices.wet3d, gridmetrics.topology, tol=1e-10
    )
    assert float(res_full) < 1e-7
    mean_full_yr = float(
        v @ np.asarray(gamma_full)[wet]
    ) / float(v.sum()) / yr
    assert 0.2 < mean_age_yr / mean_full_yr < 5.0


def test_coarse_fine_cross_check(dataset, gridmetrics, indices):
    """Coarse<->fine physics cross-check, tying C19 (LUMP/SPRAY) + L7
    (solvers) together the way the reference does
    (test/local_full.jl:151-188) — with two SHARP invariants that catch
    coarsening/restoring-mask semantic slips which per-component tests
    and range checks miss:

    1. identity coarsening (di=dj=dk=1) must reproduce the fine direct
       solve to machine precision (LUMP = I up to volume weighting);
    2. a purely VERTICAL operator coarsened 2x2x1 must reproduce the
       fine ages (columns are decoupled, and horizontal lumping of
       identical synthetic columns is exact) — the restoring mask, RHS
       lumping, and spray must all line up for this to hold.

    For the full T, 2x2 lumping on a toy grid is a quarter-basin-scale
    instant-mixing perturbation, so the volume-mean ages agree only to
    O(1) (measured ~0.35-0.4x on toy grids; the reference runs this at
    360x300 where the error is small) — pinned as a band."""
    import scipy.sparse as sp
    from scipy.sparse.linalg import spsolve

    from otmb_tpu.models.solvers import ideal_age
    from otmb_tpu.models.transport import buildTkVML, buildTkVdeep
    from otmb_tpu.ops.coeffs import add_coeffs
    from otmb_tpu.utils.coarsen import ideal_age_coarsened

    gm, idx = gridmetrics, indices
    wet = np.asarray(idx.wet3d)
    v = wet_vector(np.nan_to_num(np.asarray(gm.v3d)), idx)
    yr = 365.25 * 86400.0

    phi = facefluxesfrommasstransport(
        umo=dataset.umo, vmo=dataset.vmo, gridmetrics=gm, indices=idx
    )
    ops = transportmatrix(
        phi=phi, mlotst=dataset.mlotst, gridmetrics=gm, indices=idx
    )

    # fine reference: host direct solve of (T + M) x = 1
    mat = coeffs_to_scipy(ops.T, idx, gm.topology)
    issrf = wet.copy()
    issrf[1:] = False
    m = sp.diags(wet_vector(issrf.astype(float), idx))
    g_fine = spsolve((mat + m).tocsc(), np.ones(mat.shape[0]))

    # invariant 1: identity coarsening == fine solve (machine precision)
    g_id, _, _ = ideal_age_coarsened(
        ops.T, idx, gm.topology, gm.v3d, di=1, dj=1, dk=1
    )
    np.testing.assert_allclose(g_id[wet], g_fine, rtol=1e-10)

    # invariant 2: vertical-only operator, 2x2x1 lumping == fine solve
    tv = add_coeffs(
        buildTkVdeep(gridmetrics=gm, indices=idx),
        buildTkVML(mlotst=dataset.mlotst, gridmetrics=gm, indices=idx),
    )
    mat_v = coeffs_to_scipy(tv, idx, gm.topology)
    gv_fine = spsolve((mat_v + m).tocsc(), np.ones(mat_v.shape[0]))
    gv_c, _, _ = ideal_age_coarsened(
        tv, idx, gm.topology, gm.v3d, di=2, dj=2, dk=1
    )
    np.testing.assert_allclose(gv_c[wet], gv_fine, rtol=1e-8)

    # full T, 2x2x1: volume-mean band vs the MATRIX-FREE fine solve
    # (the TPU path), toy-grid coarsening error documented above
    g_c, _, _ = ideal_age_coarsened(
        ops.T, idx, gm.topology, gm.v3d, di=2, dj=2, dk=1
    )
    g_mf, res = ideal_age(ops.T, idx.wet3d, gm.topology, tol=1e-10)
    assert float(res) < 1e-7
    mean_c = float(v @ g_c[wet]) / v.sum() / yr
    mean_f = float(v @ np.asarray(g_mf)[wet]) / v.sum() / yr
    assert 0.15 < mean_c / mean_f < 1.1
