"""Velocity <-> flux converters, Arakawa classification, B->C interpolation."""

import numpy as np
import pytest

from otmb_tpu.grid.geometry import midpoint_on_sphere
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.ops.velocities import (
    facefluxesfromvelocities,
    fluxes2velocity,
    getarakawagrid,
    interpolateontodefaultCgrid,
    velocity2fluxes,
)


def _cgrid_points(gridmetrics):
    vlon = np.asarray(gridmetrics.lon_vertices)
    vlat = np.asarray(gridmetrics.lat_vertices)
    u_lon, u_lat = midpoint_on_sphere(vlon[1], vlat[1], vlon[2], vlat[2])
    v_lon, v_lat = midpoint_on_sphere(vlon[2], vlat[2], vlon[3], vlat[3])
    return np.asarray(u_lon), np.asarray(u_lat), np.asarray(v_lon), np.asarray(v_lat)


def test_arakawa_classification(gridmetrics):
    u_lon, u_lat, v_lon, v_lat = _cgrid_points(gridmetrics)
    g = getarakawagrid(u_lon, u_lat, v_lon, v_lat, gridmetrics)
    assert g.kind == "C" and g.u_pos == "E" and g.v_pos == "N"

    # B-grid: both velocities at the NE corner
    vlon = np.asarray(gridmetrics.lon_vertices)
    vlat = np.asarray(gridmetrics.lat_vertices)
    g = getarakawagrid(vlon[2], vlat[2], vlon[2], vlat[2], gridmetrics)
    assert g.kind == "B" and g.u_pos == "NE"

    # A-grid: both at the center
    lon = np.asarray(gridmetrics.lon)
    lat = np.asarray(gridmetrics.lat)
    g = getarakawagrid(lon, lat, lon, lat, gridmetrics)
    assert g.kind == "A"


def test_cgrid_interpolation_is_identity(gridmetrics):
    u_lon, u_lat, v_lon, v_lat = _cgrid_points(gridmetrics)
    shape = gridmetrics.shape
    rng = np.random.default_rng(0)
    u = rng.standard_normal(shape)
    v = rng.standard_normal(shape)
    out = interpolateontodefaultCgrid(u, u_lon, u_lat, v, v_lon, v_lat, gridmetrics)
    assert out[0] is u and out[3] is v


def test_bgrid_interpolation(gridmetrics):
    """B(NE) -> C averages the corner velocities along each face with
    zero-padded open boundaries (gridcellgeometry.jl:127-128)."""
    vlon = np.asarray(gridmetrics.lon_vertices)
    vlat = np.asarray(gridmetrics.lat_vertices)
    shape = gridmetrics.shape
    rng = np.random.default_rng(1)
    u = rng.standard_normal(shape)
    v = rng.standard_normal(shape)
    u2, _, _, v2, _, _ = interpolateontodefaultCgrid(
        u, vlon[2], vlat[2], v, vlon[2], vlat[2], gridmetrics
    )
    u2, v2 = np.asarray(u2), np.asarray(v2)
    # interior checks
    np.testing.assert_allclose(u2[:, 3, 5], 0.5 * (u[:, 3, 5] + u[:, 2, 5]))
    np.testing.assert_allclose(v2[:, 3, 5], 0.5 * (v[:, 3, 5] + v[:, 3, 4]))
    # zero-padded boundaries
    np.testing.assert_allclose(u2[:, 0, :], 0.5 * u[:, 0, :])
    np.testing.assert_allclose(v2[:, :, 0], 0.5 * v[:, :, 0])


def test_velocity_flux_roundtrip(gridmetrics, indices):
    """fluxes2velocity(velocity2fluxes(u, v)) == (u, v) on wet faces
    (reference test/local_full.jl:300-304 and test_fluxes2velocity.jl)."""
    u_lon, u_lat, v_lon, v_lat = _cgrid_points(gridmetrics)
    shape = gridmetrics.shape
    rng = np.random.default_rng(2)
    u = 0.1 * rng.standard_normal(shape)
    v = 0.1 * rng.standard_normal(shape)
    rho = 1035.0

    phi_i, phi_j = velocity2fluxes(u, u_lon, u_lat, v, v_lon, v_lat, gridmetrics, rho)
    u2, v2 = fluxes2velocity(phi_i, phi_j, gridmetrics, rho)
    u2, v2 = np.asarray(u2), np.asarray(v2)

    # Valid where the face has a finite thickness pair (at least one wet cell)
    ok_u = np.isfinite(u2)
    ok_v = np.isfinite(v2)
    assert ok_u.sum() > 0 and ok_v.sum() > 0
    np.testing.assert_allclose(u2[ok_u], u[ok_u], rtol=1e-12)
    np.testing.assert_allclose(v2[ok_v], v[ok_v], rtol=1e-12)


def test_facefluxes_from_velocities_consistent(dataset, gridmetrics, indices):
    """Velocities derived from umo/vmo must reproduce the same face fluxes
    through the velocity entry point (exactly, since the conversion is
    algebraically inverse on wet faces)."""
    phi = facefluxesfrommasstransport(
        umo=dataset.umo, vmo=dataset.vmo, gridmetrics=gridmetrics, indices=indices
    )
    u, v = fluxes2velocity(phi.east, phi.north, gridmetrics, 1035.0)
    u = np.where(np.isfinite(np.asarray(u)), np.asarray(u), 0.0)
    v = np.where(np.isfinite(np.asarray(v)), np.asarray(v), 0.0)
    u_lon, u_lat, v_lon, v_lat = _cgrid_points(gridmetrics)

    phi_bis = facefluxesfromvelocities(
        uo=u, uo_lon=u_lon, uo_lat=u_lat, vo=v, vo_lon=v_lon, vo_lat=v_lat,
        gridmetrics=gridmetrics, indices=indices, rho=1035.0,
    )
    for name in ("east", "west", "north", "south", "top", "bottom"):
        np.testing.assert_allclose(
            np.asarray(getattr(phi_bis, name)),
            np.asarray(getattr(phi, name)),
            rtol=1e-9,
            atol=1e-2,
            err_msg=name,
        )
