"""Derivative kernels: analytic checks the reference lacks (its derivative
tests are plot-only, test/derivatives.jl) plus dyad/triad semantics."""

import numpy as np
import pytest

from otmb_tpu.models.redigm import bolus_gm_velocity, density_slopes
from otmb_tpu.ops.derivatives import (
    centered_triad_derivative,
    horizontal_derivative_backward,
    horizontal_derivative_forward,
    vertical_derivative_backward,
    vertical_derivative_forward,
    vertical_dyad_derivative,
    vertical_face_triad_derivative,
)


def test_vertical_derivative_linear_in_z(gridmetrics):
    """d/dz of z itself must be 1 wherever both cells exist."""
    z = np.asarray(gridmetrics.z3d)
    fwd = np.asarray(vertical_derivative_forward(z, gridmetrics))
    bwd = np.asarray(vertical_derivative_backward(z, gridmetrics))
    ok = np.isfinite(fwd)
    assert ok[: gridmetrics.shape[0] - 1].any()
    np.testing.assert_allclose(fwd[ok], 1.0, rtol=1e-12)
    ok = np.isfinite(bwd)
    np.testing.assert_allclose(bwd[ok], 1.0, rtol=1e-12)


def test_vertical_dyad_of_z_squared(gridmetrics, indices):
    """Dyad vertical derivative of z^2 (the reference's visual check,
    test/derivatives.jl, made numeric).

    Note the dyad's "N" leg is k-1 (upward, dyads.jl:39-41), so it is a
    d/d(height) = -d/d(depth) derivative: for chi = z^2 the exact dyad
    value is -(z + z_up)/1 averaged with -(z + z_dn), i.e. ~ -2z."""
    z = np.asarray(gridmetrics.z3d)
    wet = np.asarray(indices.wet3d)
    dz2 = np.asarray(vertical_dyad_derivative(z**2, gridmetrics, wet))
    ok = wet & np.isfinite(dz2)

    # exact expected value: NaN-weighted mean of -(z_up + z) and -(z + z_dn)
    z_up = np.full_like(z, np.nan)
    z_up[1:] = z[:-1]
    z_dn = np.full_like(z, np.nan)
    z_dn[:-1] = z[1:]
    chi = np.where(wet, z, np.nan)
    chi_up = np.full_like(z, np.nan)
    chi_up[1:] = chi[:-1]
    chi_dn = np.full_like(z, np.nan)
    chi_dn[:-1] = chi[1:]
    legs = np.stack([-(chi_up + z), -(z + chi_dn)])
    expect = np.nanmean(np.where(np.isfinite(legs), legs, np.nan), axis=0)
    np.testing.assert_allclose(dz2[ok], expect[ok], rtol=1e-12)


def test_horizontal_derivative_of_constant_is_zero(gridmetrics):
    c = np.full(gridmetrics.shape, 3.14)
    for direction in ("i", "j"):
        fwd = np.asarray(horizontal_derivative_forward(c, gridmetrics, direction))
        bwd = np.asarray(horizontal_derivative_backward(c, gridmetrics, direction))
        np.testing.assert_allclose(fwd[np.isfinite(fwd)], 0.0, atol=1e-18)
        np.testing.assert_allclose(bwd[np.isfinite(bwd)], 0.0, atol=1e-18)


def test_horizontal_derivative_scales_with_distance(gridmetrics):
    """d/di of longitude-proportional field: check against the haversine
    distances actually used."""
    lon = np.asarray(gridmetrics.lon)
    chi = np.broadcast_to(lon, gridmetrics.shape).copy()
    fwd = np.asarray(horizontal_derivative_forward(chi, gridmetrics, "i"))
    dist = np.asarray(gridmetrics.distance_to_neighbour["east"])
    dlon = np.roll(lon, -1, axis=-1) - lon
    expect = dlon / dist
    ok = np.isfinite(fwd) & (np.abs(dlon) < 180)
    np.testing.assert_allclose(fwd[ok], np.broadcast_to(expect, fwd.shape)[ok], rtol=1e-12)


def test_triad_slope_of_separable_field(gridmetrics, indices):
    """For chi = a*x + b*z the isoneutral slope dE/dN ratios are all
    (dchi/dx)/(dchi/dz) = a'/b where a' is the local horizontal gradient;
    with b constant the triad must recover ratio = horizontal-slope / b."""
    z = np.asarray(gridmetrics.z3d)
    wet = np.asarray(indices.wet3d)
    b = 0.01
    chi = b * z  # no horizontal structure: slope must be ~0
    s = np.asarray(vertical_face_triad_derivative(chi, gridmetrics, "i", wet))
    ok = np.isfinite(s)
    assert ok.sum() > 0
    np.testing.assert_allclose(s[ok], 0.0, atol=1e-10)


def test_triad_and_dyad_nan_weighting(gridmetrics, indices):
    """Cells with only one finite vertical neighbor still get a slope (the
    NaN-weighted mean ignores missing legs)."""
    wet = np.asarray(indices.wet3d)
    z = np.asarray(gridmetrics.z3d)
    chi = np.where(wet, z, np.nan)
    d = np.asarray(vertical_dyad_derivative(chi, gridmetrics, wet))
    # surface wet cells have only the downward leg; still finite, and the
    # dyad of chi = z is -1 (d/d(height) convention, see above)
    surf_wet = wet[0] & wet[1] if wet.shape[0] > 1 else wet[0]
    assert np.isfinite(d[0][surf_wet]).all()
    np.testing.assert_allclose(d[0][surf_wet], -1.0, rtol=1e-12)


def test_centered_triad_runs(gridmetrics, indices):
    wet = np.asarray(indices.wet3d)
    rng = np.random.default_rng(0)
    chi = np.where(wet, rng.standard_normal(gridmetrics.shape), np.nan)
    for direction in ("i", "j"):
        out = np.asarray(centered_triad_derivative(chi, gridmetrics, direction, wet))
        assert out.shape == gridmetrics.shape
        assert np.isfinite(out[wet]).any()


def test_redigm_bolus(gridmetrics, indices):
    """GM bolus velocity: runs, finite on wet cells with enough neighbors,
    respects the slope clamp/taper (reference RediGM.jl:46-79)."""
    wet = np.asarray(indices.wet3d)
    z = np.asarray(gridmetrics.z3d)
    lat = np.asarray(gridmetrics.lat)
    rho = np.where(wet, 1025.0 + 0.02 * z + 0.5 * np.sin(np.deg2rad(lat)), np.nan)

    s_i, s_j = density_slopes(rho, gridmetrics, wet)
    s_i, s_j = np.asarray(s_i), np.asarray(s_j)
    assert np.isfinite(s_i[wet]).any()

    u, v = bolus_gm_velocity(rho, gridmetrics, wet)
    u, v = np.asarray(u), np.asarray(v)
    assert u.shape == gridmetrics.shape
    finite_u = u[np.isfinite(u)]
    assert finite_u.size > 0
    # kappa_GM * maxslope / min dz bounds the magnitude
    dz_min = float(np.nanmin(np.asarray(gridmetrics.thkcello)))
    assert np.abs(finite_u).max() < 600.0 * 0.01 * 2 / dz_min
