"""Degenerate-grid robustness (round-4 verdict #7): real CMIP grids
contain what smooth synthetic fields don't — isolated one-cell basins,
single-layer columns, mixed-layer depths deeper than the water column,
zero-volume cells punching holes into a column, land-locked seas
straddling the tripolar seam. Each case must keep (a) exact oracle
parity of the assembled operator, (b) the reference sign structure,
(c) solver completion with the tridiagonal preconditioner, and
(d) coarsening that respects connectivity (reference semantics:
velocities.jl:154-179 no-flux masking, extratools.jl:70-77 connected
components)."""

import dataclasses

import numpy as np
import pytest

import jax

from otmb_tpu.grid.geometry import makegridmetrics
from otmb_tpu.grid.indices import makeindices
from otmb_tpu.models.solvers import ideal_age
from otmb_tpu.models.transport import transportmatrix
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.utils.sparse_export import coeffs_to_scipy
from otmb_tpu.utils.synthetic import synthetic_dataset

from reference_oracle import (
    gm_to_numpy,
    oracle_advection_matrix,
    oracle_facefluxes,
    oracle_horizontal_diffusion_matrix,
    oracle_vertical_diffusion_matrix,
)


def _degenerate_case(topology: str, seed: int = 7):
    """A synthetic dataset with every degenerate feature carved in."""
    # land_fraction=0: random land plus the carving below can strand a
    # deep pocket with no path to the surface, which makes (T + M)
    # genuinely singular (infinite ideal age) — not the robustness
    # property under test. Start from full ocean so the ONLY degenerate
    # features are the deliberate ones.
    ds = synthetic_dataset(nx=16, ny=10, nz=5, topology=topology,
                           seed=seed, land_fraction=0.0)
    nz, ny, nx = ds.wet3d.shape
    vol = np.array(ds.volcello)
    wet = np.array(ds.wet3d)
    mlotst = np.array(ds.mlotst)
    umo, vmo = np.array(ds.umo), np.array(ds.vmo)

    def dry_column(j, i):
        wet[:, j, i] = False
        vol[:, j, i] = np.nan

    # 1. isolated one-cell basin: a single surface-only wet cell whose
    # four horizontal neighbors are land at every level
    j0, i0 = 3, 5
    for jj, ii in [(j0, i0 - 1), (j0, i0 + 1), (j0 - 1, i0), (j0 + 1, i0)]:
        dry_column(jj, ii % nx)
    wet[:, j0, i0] = False
    wet[0, j0, i0] = True
    vol[1:, j0, i0] = np.nan

    # 2. single-layer columns: a band of depth-1 ocean
    wet[1:, 6, 0:4] = False
    vol[1:, 6, 0:4] = np.nan

    # 3. mlotst deeper than the water column
    mlotst[6, 0:4] = 1e4
    mlotst[j0, i0] = 1e4

    # 4. zero-volume cell mid-column: volcello == 0 must canonicalize to
    # NaN (reference gridcellgeometry.jl:269-280), punching a dry hole
    # with wet cells below it. The hole's lateral neighbors are made
    # full-depth so the sub-hole cells keep horizontal connections (the
    # random bathymetry would otherwise strand them — a genuinely
    # singular system, not the feature under test).
    j4, i4 = 2, 10
    fill = np.nanmean(vol)
    for jj, ii in [(j4, i4), (j4, i4 - 1), (j4, i4 + 1),
                   (j4 - 1, i4), (j4 + 1, i4)]:
        wet[:, jj, ii % nx] = True
        vol[:, jj, ii % nx] = np.where(np.isnan(vol[:, jj, ii % nx]),
                                       fill, vol[:, jj, ii % nx])
    vol[1, j4, i4] = 0.0
    wet[1, j4, i4] = False

    if topology == "tripolar":
        # 5. land-locked sea straddling the seam: fold partners
        # (i, ny-1) and (nx-1-i, ny-1) wet, surrounded by land
        i5 = 2
        i5f = nx - 1 - i5
        for ii in (i5 - 1, i5 + 1, i5f - 1, i5f + 1):
            dry_column(ny - 1, ii % nx)
        dry_column(ny - 2, i5)
        dry_column(ny - 2, i5f)
        wet[:, ny - 1, i5] = False
        wet[0, ny - 1, i5] = True
        vol[1:, ny - 1, i5] = np.nan
        wet[:, ny - 1, i5f] = False
        wet[0, ny - 1, i5f] = True
        vol[1:, ny - 1, i5f] = np.nan

    # consistency: NaN transports and mlotst on land, like CMIP output
    vol = np.where(wet, np.where(np.isnan(vol), np.nanmean(vol), vol),
                   np.where(vol == 0.0, 0.0, np.nan))
    umo = np.where(wet, np.nan_to_num(umo), np.nan)
    vmo = np.where(wet, np.nan_to_num(vmo), np.nan)
    land_col = ~wet.any(axis=0)
    mlotst = np.where(land_col, np.nan, np.where(np.isnan(mlotst), 30.0,
                                                 mlotst))
    area = np.where(land_col, np.nan, np.nan_to_num(ds.areacello,
                                                    nan=np.nanmean(ds.areacello)))
    return dataclasses.replace(
        ds, volcello=vol, areacello=area, umo=umo, vmo=vmo, mlotst=mlotst,
        wet3d=wet,
    )


@pytest.mark.parametrize("topology", ["bipolar", "tripolar"])
def test_degenerate_operator_oracle_parity(topology):
    ds = _degenerate_case(topology)
    gm = makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon,
        lat=ds.lat, lev=ds.lev, lon_vertices=ds.lon_vertices,
        lat_vertices=ds.lat_vertices,
    )
    idx = makeindices(gm.v3d)
    wet = np.asarray(idx.wet3d)
    # the zero-volume cell must have canonicalized to dry
    assert not wet[1, 2, 10]
    assert wet[2, 2, 10]  # the cell below the hole is still ocean

    phi = facefluxesfrommasstransport(
        umo=ds.umo, vmo=ds.vmo, gridmetrics=gm, indices=idx
    )
    phi_o = oracle_facefluxes(ds.umo, ds.vmo, wet, gm.topology)
    for name in phi._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(phi, name)), phi_o[name], rtol=1e-12,
            atol=1e-6, err_msg=name,
        )

    ops = transportmatrix(
        phi=phi, mlotst=ds.mlotst, gridmetrics=gm, indices=idx
    )
    gm_np = gm_to_numpy(gm)
    from otmb_tpu.ops.coeffs import mixed_layer_mask

    ref = (
        oracle_advection_matrix(phi_o, gm_np["v3d"], 1035.0, wet,
                                gm.topology, upwind=True)
        + oracle_horizontal_diffusion_matrix(gm_np, wet, gm.topology, 500.0)
        + oracle_vertical_diffusion_matrix(
            gm_np, wet, gm.topology, 0.1,
            omega=np.asarray(mixed_layer_mask(gm, ds.mlotst)),
        )
        + oracle_vertical_diffusion_matrix(gm_np, wet, gm.topology, 1e-5)
    ).toarray()
    ours = coeffs_to_scipy(ops.T, idx, gm.topology).toarray()
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-15)

    # reference sign structure (test/online.jl:119-123)
    diag = np.diag(ours)
    off = ours - np.diag(diag)
    assert (diag >= 0).all()
    assert (off <= 1e-18).all()


@pytest.mark.parametrize("topology", ["bipolar", "tripolar"])
def test_degenerate_solver_completion(topology):
    """ideal_age completes on the degenerate grid: every wet feature —
    the isolated basin, the single-layer band, the seam-straddling sea,
    the sub-hole cells — gets a finite age, and the solve meets tol."""
    ds = _degenerate_case(topology)
    gm = makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon,
        lat=ds.lat, lev=ds.lev, lon_vertices=ds.lon_vertices,
        lat_vertices=ds.lat_vertices,
    )
    idx = makeindices(gm.v3d)
    phi = facefluxesfrommasstransport(
        umo=ds.umo, vmo=ds.vmo, gridmetrics=gm, indices=idx
    )
    ops = transportmatrix(
        phi=phi, mlotst=ds.mlotst, gridmetrics=gm, indices=idx
    )
    wet = np.asarray(idx.wet3d)
    gamma, res = ideal_age(ops.T, idx.wet3d, gm.topology, tol=1e-9)
    assert float(res) < 1e-7
    g = np.asarray(gamma)
    assert np.isfinite(g[wet]).all()
    assert (g[wet] >= -1e-6).all()
    # the isolated basin is pure surface restoring: age ~ 0
    assert abs(g[0, 3, 5]) < 1.0

    # chunked engine (the production path at blocked sizes) also
    # completes on the degenerate grid
    from otmb_tpu.models.solvers import solve_shifted_chunked

    c32 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), ops.T)
    ones = np.where(wet, 1.0, 0.0).astype(np.float32)
    surf = np.zeros(wet.shape, np.float32)
    surf[0] = 1.0
    surf = np.where(wet, surf, 0.0)
    st = {}
    x, res_c = solve_shifted_chunked(
        c32, ones, gm.topology, extra_diag=surf, tol=1e-5,
        algorithm="bicgstab2", stats=st,
    )
    assert float(res_c) < 1e-4
    assert np.isfinite(np.asarray(x)[wet]).all()


def test_degenerate_coarsening_respects_connectivity():
    """lump_and_spray must NOT lump the isolated basin (or the
    seam-straddling sea) with cells it is not connected to through T's
    sparsity (reference extratools.jl:70-77)."""
    ds = _degenerate_case("tripolar")
    gm = makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon,
        lat=ds.lat, lev=ds.lev, lon_vertices=ds.lon_vertices,
        lat_vertices=ds.lat_vertices,
    )
    idx = makeindices(gm.v3d)
    phi = facefluxesfrommasstransport(
        umo=ds.umo, vmo=ds.vmo, gridmetrics=gm, indices=idx
    )
    ops = transportmatrix(
        phi=phi, mlotst=ds.mlotst, gridmetrics=gm, indices=idx
    )
    from otmb_tpu.grid.indices import wet_vector
    from otmb_tpu.utils.coarsen import lump_and_spray

    wet = np.asarray(idx.wet3d)
    v = wet_vector(np.where(wet, np.asarray(gm.v3d), 0.0), idx)
    T_sp = coeffs_to_scipy(ops.T, idx, gm.topology)
    lump, spray, vol_c = lump_and_spray(wet, v, T_sp, di=2, dj=2, dk=1)
    lump = lump.tocsr()
    # the isolated basin's wet-vector position
    wetpos = np.full(wet.shape, -1, np.int64)
    wetpos[wet] = np.arange(wet.sum())
    basin = wetpos[0, 3, 5]
    row = np.flatnonzero(np.asarray(lump[:, basin].todense()).ravel())
    assert len(row) == 1
    members = np.flatnonzero(np.asarray(lump[row[0]].todense()).ravel())
    # the basin must be alone in its coarse cell: nothing else in its
    # 2x2 block is connected to it
    assert members.tolist() == [basin]
