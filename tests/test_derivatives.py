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


# --- potential-density slopes (reference RediGM.jl:17-35) ------------------


def _pdens_oracle(eos, so, ct, z3d, d2n, topo, wet3d, direction):
    """Per-cell loop mirroring localpotentialdensityslope /
    globalpotentialdensityslope (RediGM.jl:17-35): eos evaluated at all 6
    triad-group members with the CENTER cell's depth as zref."""
    from tests.reference_oracle import i_p1, j_p1, k_m1, k_p1

    fwd_fn = i_p1 if direction == "i" else j_p1
    fwd_name = "east" if direction == "i" else "north"
    out = np.full(so.shape, np.nan)
    nz, ny, nx = so.shape

    def vdist(a, b):
        if a is None or b is None:
            return np.nan
        return abs(z3d[b] - z3d[a])

    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                c = (k, j, i)
                if not wet3d[c]:
                    continue
                n = k_m1(c, topo)
                s = k_p1(c, topo)
                e = fwd_fn(c, topo)
                ne = k_m1(e, topo) if e is not None else None
                se = k_p1(e, topo) if e is not None else None
                zref = z3d[c]

                def val(cell):
                    if cell is None:
                        return np.nan
                    return eos(so[cell], ct[cell], zref)

                dists = dict(
                    CN=vdist(c, n), CS=vdist(c, s),
                    CE=d2n[fwd_name][j, i],
                    ENE=vdist(e, ne), ESE=vdist(e, se),
                )
                d_cn = (val(n) - val(c)) / dists["CN"]
                d_cs = (val(c) - val(s)) / dists["CS"]
                d_ce = (val(e) - val(c)) / dists["CE"]
                d_ene = (val(ne) - val(e)) / dists["ENE"]
                d_ese = (val(e) - val(se)) / dists["ESE"]
                ratios = [d_ce / d_cn, d_ce / d_cs, d_ce / d_ene, d_ce / d_ese]
                finite = [r for r in ratios if np.isfinite(r)]
                if finite:
                    out[c] = np.mean(finite)
    return out


def _synthetic_so_ct(gridmetrics, wet):
    z = np.asarray(gridmetrics.z3d)
    lat = np.asarray(gridmetrics.lat)
    lon = np.asarray(gridmetrics.lon)
    so = np.where(wet, 35.0 + 0.002 * z + 0.3 * np.sin(np.deg2rad(lat)), np.nan)
    ct = np.where(
        wet, 20.0 - 0.004 * z + 0.5 * np.cos(np.deg2rad(lon)) , np.nan
    )
    return so, ct


def test_potential_density_slope_zref_independent_eos(gridmetrics, indices):
    """With an eos that ignores zref, the potential-density slope must equal
    the plain triad slope of the density field."""
    from otmb_tpu.models.redigm import potential_density_slopes

    wet = np.asarray(indices.wet3d)
    so, ct = _synthetic_so_ct(gridmetrics, wet)

    def eos(s, c, zref):
        return 1000.0 + 0.8 * s - 0.2 * c

    s_i, s_j = potential_density_slopes(eos, so, ct, gridmetrics, wet)
    ref_i, ref_j = density_slopes(eos(so, ct, None), gridmetrics, wet)
    for got, ref in ((s_i, ref_i), (s_j, ref_j)):
        got, ref = np.asarray(got), np.asarray(ref)
        ok = np.isfinite(ref)
        assert (np.isfinite(got) == ok).all()
        np.testing.assert_allclose(got[ok], ref[ok], rtol=1e-10)


def test_potential_density_slope_matches_oracle(gridmetrics, indices):
    """zref-dependent eos: the vectorized slope matches a literal per-cell
    re-implementation of the reference loop (both directions)."""
    from tests.reference_oracle import gm_to_numpy

    from otmb_tpu.models.redigm import potential_density_slopes

    wet = np.asarray(indices.wet3d)
    so, ct = _synthetic_so_ct(gridmetrics, wet)
    z3d = np.asarray(gridmetrics.z3d)
    d2n = gm_to_numpy(gridmetrics)["distance_to_neighbour"]

    def eos(s, c, zref):
        # nonlinear in all three args so zref semantics actually matter
        return 1000.0 + 0.8 * s - 0.2 * c + 4.5e-3 * zref * (1.0 + 0.02 * (s - 35.0))

    s_i, s_j = potential_density_slopes(eos, so, ct, gridmetrics, wet)
    topo = gridmetrics.topology
    for got, direction in ((s_i, "i"), (s_j, "j")):
        ref = _pdens_oracle(eos, so, ct, z3d, d2n, topo, wet, direction)
        got = np.asarray(got)
        ok = np.isfinite(ref) & wet
        assert ok.sum() > 0
        assert (np.isfinite(got)[wet] == np.isfinite(ref)[wet]).all()
        np.testing.assert_allclose(got[ok], ref[ok], rtol=1e-6, atol=1e-12)
