"""Parity of the vectorized stencil assembly vs the literal per-cell oracle.

This is the core correctness suite: every operator component, on both
topologies, upwind and centered, scalar and 3D density, must match the
loop-level reference semantics entry for entry.
"""

import numpy as np
import pytest

from otmb_tpu.grid.indices import wet_vector
from otmb_tpu.models.transport import (
    buildTadv,
    buildTkH,
    buildTkVdeep,
    buildTkVML,
    transportmatrix,
)
from otmb_tpu.ops.apply import apply_stencil, apply_stencil_transpose
from otmb_tpu.ops.coeffs import mixed_layer_mask
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.utils.sparse_export import coeffs_to_scipy

from reference_oracle import (
    gm_to_numpy,
    oracle_advection_matrix,
    oracle_facefluxes,
    oracle_horizontal_diffusion_matrix,
    oracle_vertical_diffusion_matrix,
)


@pytest.fixture(scope="module")
def phi(dataset, gridmetrics, indices):
    return facefluxesfrommasstransport(
        umo=dataset.umo, vmo=dataset.vmo, gridmetrics=gridmetrics, indices=indices
    )


@pytest.fixture(scope="module")
def phi_oracle(dataset, gridmetrics, indices):
    return oracle_facefluxes(
        dataset.umo,
        dataset.vmo,
        np.asarray(indices.wet3d),
        gridmetrics.topology,
    )


def test_fluxes_match_oracle(phi, phi_oracle):
    for name in ("east", "west", "north", "south", "top", "bottom"):
        np.testing.assert_allclose(
            np.asarray(getattr(phi, name)),
            phi_oracle[name],
            rtol=1e-12,
            atol=1e-6,
            err_msg=f"face flux {name}",
        )


def test_flux_closure(phi):
    """Mass conservation of the six-face fluxes below the surface: the
    divergence is zero except through the sea surface (by construction,
    velocities.jl:227-243)."""
    div = (
        np.asarray(phi.east)
        + np.asarray(phi.north)
        + np.asarray(phi.top)
        - np.asarray(phi.west)
        - np.asarray(phi.south)
        - np.asarray(phi.bottom)
    )
    np.testing.assert_allclose(div, 0.0, atol=1e-4)


@pytest.mark.parametrize("upwind", [True, False], ids=["upwind", "centered"])
@pytest.mark.parametrize("rho_kind", ["scalar", "field"])
def test_advection_matches_oracle(
    dataset, gridmetrics, indices, phi, phi_oracle, upwind, rho_kind
):
    if rho_kind == "scalar":
        rho = 1035.0
    else:
        rng = np.random.default_rng(7)
        rho = 1035.0 + 5.0 * rng.standard_normal(gridmetrics.shape)

    coeffs = buildTadv(
        phi=phi, gridmetrics=gridmetrics, indices=indices, rho=rho, upwind=upwind
    )
    ours = coeffs_to_scipy(coeffs, indices, gridmetrics.topology).toarray()
    ref = oracle_advection_matrix(
        phi_oracle,
        np.asarray(gridmetrics.v3d),
        rho,
        np.asarray(indices.wet3d),
        gridmetrics.topology,
        upwind=upwind,
    ).toarray()
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-16)


def test_horizontal_diffusion_matches_oracle(gridmetrics, indices):
    coeffs = buildTkH(gridmetrics=gridmetrics, indices=indices, kappa_h=500.0)
    ours = coeffs_to_scipy(coeffs, indices, gridmetrics.topology).toarray()
    ref = oracle_horizontal_diffusion_matrix(
        gm_to_numpy(gridmetrics),
        np.asarray(indices.wet3d),
        gridmetrics.topology,
        500.0,
    ).toarray()
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-18)


def test_vertical_diffusion_matches_oracle(dataset, gridmetrics, indices):
    # background (whole-ocean mask)
    coeffs = buildTkVdeep(gridmetrics=gridmetrics, indices=indices, kappa_vdeep=1e-5)
    ours = coeffs_to_scipy(coeffs, indices, gridmetrics.topology).toarray()
    ref = oracle_vertical_diffusion_matrix(
        gm_to_numpy(gridmetrics), np.asarray(indices.wet3d), gridmetrics.topology,
        1e-5,
    ).toarray()
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-20)

    # mixed-layer mask
    coeffs = buildTkVML(
        mlotst=dataset.mlotst, gridmetrics=gridmetrics, indices=indices,
        kappa_vml=0.1,
    )
    ours = coeffs_to_scipy(coeffs, indices, gridmetrics.topology).toarray()
    omega = np.asarray(mixed_layer_mask(gridmetrics, dataset.mlotst))
    ref = oracle_vertical_diffusion_matrix(
        gm_to_numpy(gridmetrics), np.asarray(indices.wet3d), gridmetrics.topology,
        0.1, omega=omega,
    ).toarray()
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-20)
    assert coeffs_to_scipy(coeffs, indices, gridmetrics.topology).nnz > 0


def test_apply_matches_sparse_matvec(dataset, gridmetrics, indices, phi):
    ops = transportmatrix(
        phi=phi, mlotst=dataset.mlotst, gridmetrics=gridmetrics, indices=indices
    )
    mat = coeffs_to_scipy(ops.T, indices, gridmetrics.topology)

    rng = np.random.default_rng(11)
    chi3d = np.where(np.asarray(indices.wet3d), rng.standard_normal(gridmetrics.shape), 0.0)
    chi_wet = wet_vector(chi3d, indices)

    y3d = np.asarray(apply_stencil(ops.T, chi3d, gridmetrics.topology))
    np.testing.assert_allclose(
        wet_vector(y3d, indices), mat @ chi_wet, rtol=1e-10, atol=1e-12
    )
    # land outputs stay exactly zero
    assert np.all(y3d[~np.asarray(indices.wet3d)] == 0.0)

    yt3d = np.asarray(apply_stencil_transpose(ops.T, chi3d, gridmetrics.topology))
    np.testing.assert_allclose(
        wet_vector(yt3d, indices), mat.T @ chi_wet, rtol=1e-10, atol=1e-12
    )


def test_transpose_matches_jax_linear_transpose(dataset, gridmetrics, indices, phi):
    import jax

    ops = transportmatrix(
        phi=phi, mlotst=dataset.mlotst, gridmetrics=gridmetrics, indices=indices
    )
    rng = np.random.default_rng(5)
    x = np.where(np.asarray(indices.wet3d), rng.standard_normal(gridmetrics.shape), 0.0)

    f = lambda v: apply_stencil(ops.T, v, gridmetrics.topology)
    (auto_t,) = jax.linear_transpose(f, x)(x)
    manual_t = apply_stencil_transpose(ops.T, x, gridmetrics.topology)
    np.testing.assert_allclose(np.asarray(auto_t), np.asarray(manual_t), rtol=1e-12, atol=1e-12)
