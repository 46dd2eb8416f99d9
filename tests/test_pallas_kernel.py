"""Pallas stencil kernel vs the jnp reference apply (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from otmb_tpu.models.transport import transportmatrix
from otmb_tpu.ops.apply import apply_stencil
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.ops.stencil_pallas import apply_stencil_pallas, euler_step_pallas


@pytest.fixture(scope="module")
def ops(dataset, gridmetrics, indices):
    phi = facefluxesfrommasstransport(
        umo=dataset.umo, vmo=dataset.vmo, gridmetrics=gridmetrics, indices=indices
    )
    return transportmatrix(
        phi=phi, mlotst=dataset.mlotst, gridmetrics=gridmetrics, indices=indices
    )


def test_pallas_apply_matches_reference(ops, gridmetrics, indices):
    wet = np.asarray(indices.wet3d)
    rng = np.random.default_rng(0)
    chi = np.where(wet, rng.standard_normal(gridmetrics.shape), 0.0)

    ref = np.asarray(apply_stencil(ops.T, chi, gridmetrics.topology))
    out = np.asarray(
        apply_stencil_pallas(ops.T, chi, gridmetrics.topology, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-14)


def test_pallas_apply_f32(ops, gridmetrics, indices):
    """The TPU hot path runs float32; kernel must agree with the f32 jnp
    apply at f32 precision."""
    import jax

    wet = np.asarray(indices.wet3d)
    rng = np.random.default_rng(1)
    chi = np.where(wet, rng.standard_normal(gridmetrics.shape), 0.0).astype(np.float32)
    coeffs32 = jax.tree_util.tree_map(lambda x: x.astype(np.float32), ops.T)

    ref = np.asarray(apply_stencil(coeffs32, chi, gridmetrics.topology))
    out = np.asarray(
        apply_stencil_pallas(coeffs32, chi, gridmetrics.topology, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pallas_euler_step(ops, gridmetrics, indices):
    wet = np.asarray(indices.wet3d)
    rng = np.random.default_rng(2)
    chi = np.where(wet, 1.0 + 0.1 * rng.standard_normal(gridmetrics.shape), 0.0)
    dt = 100.0

    ref = chi - dt * np.asarray(apply_stencil(ops.T, chi, gridmetrics.topology))
    out = np.asarray(
        euler_step_pallas(ops.T, chi, dt, gridmetrics.topology, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("variant", ["simple", "carry"])
def test_pallas_variants_match(ops, gridmetrics, indices, variant):
    wet = np.asarray(indices.wet3d)
    rng = np.random.default_rng(3)
    chi = np.where(wet, rng.standard_normal(gridmetrics.shape), 0.0)
    ref = np.asarray(apply_stencil(ops.T, chi, gridmetrics.topology))
    out = np.asarray(
        apply_stencil_pallas(
            ops.T, chi, gridmetrics.topology, interpret=True, variant=variant
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-13)
    out2 = np.asarray(
        euler_step_pallas(
            ops.T, chi, 50.0, gridmetrics.topology, interpret=True, variant=variant
        )
    )
    np.testing.assert_allclose(out2, chi - 50.0 * ref, rtol=1e-12, atol=1e-11)


@pytest.mark.parametrize("variant", ["simple", "carry"])
def test_pallas_bf16_coefficients(ops, gridmetrics, indices, variant):
    """Mixed precision: bf16 coefficient streams, f32 chi/accumulation."""
    import jax
    import jax.numpy as jnp

    wet = np.asarray(indices.wet3d)
    rng = np.random.default_rng(4)
    chi = np.where(wet, rng.standard_normal(gridmetrics.shape), 0.0).astype(np.float32)
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), t)
    coeffs_bf16 = cast(ops.T)

    ref = np.asarray(apply_stencil(ops.T, chi, gridmetrics.topology))
    out = np.asarray(
        apply_stencil_pallas(
            coeffs_bf16, chi, gridmetrics.topology, interpret=True, variant=variant
        )
    )
    assert out.dtype == np.float32
    # bf16 has ~3 significant decimal digits
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-2)


@pytest.mark.parametrize("by", [1, 2, 7])
def test_pallas_blocked_variant(ops, gridmetrics, indices, by):
    """j-blocked kernel (multi-block, incl. non-even halo rows) must match
    the reference apply; ny=14 so by=7 gives 2 blocks, by=2 gives 7."""
    if gridmetrics.topology.ny % by:
        pytest.skip("by must divide ny")
    wet = np.asarray(indices.wet3d)
    rng = np.random.default_rng(5)
    chi = np.where(wet, rng.standard_normal(gridmetrics.shape), 0.0)
    ref = np.asarray(apply_stencil(ops.T, chi, gridmetrics.topology))
    out = np.asarray(
        apply_stencil_pallas(
            ops.T, chi, gridmetrics.topology, interpret=True,
            variant="blocked", by_static=by,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-13)
    out2 = np.asarray(
        euler_step_pallas(
            ops.T, chi, 50.0, gridmetrics.topology, interpret=True,
            variant="blocked", by_static=by,
        )
    )
    np.testing.assert_allclose(out2, chi - 50.0 * ref, rtol=1e-12, atol=1e-11)


@pytest.mark.parametrize("by", [2, 7])
def test_propagate_blocked_loop_matches_stepwise(ops, gridmetrics, indices, by):
    """The loop-optimized blocked propagation (kernel-emitted halo-row
    streams, single-use carry) is exactly equal to calling the blocked
    Euler step nsteps times."""
    from otmb_tpu.ops.stencil_pallas import euler_propagate_pallas

    topo = gridmetrics.topology
    wet = np.asarray(indices.wet3d)
    rng = np.random.default_rng(8)
    chi = np.where(wet, rng.standard_normal(gridmetrics.shape), 0.0)
    dt, nsteps = 120.0, 7

    ref = jnp.asarray(chi)
    for _ in range(nsteps):
        ref = euler_step_pallas(ops.T, ref, dt, topo, interpret=True,
                                variant="blocked", by_static=by)
    out = euler_propagate_pallas(ops.T, chi, dt, nsteps, topo,
                                 interpret=True, variant="blocked",
                                 by_static=by)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_propagate_auto_variant_matches_stepwise(ops, gridmetrics, indices):
    """Auto variant (carry kernel at this grid size) through the public
    propagation entry."""
    from otmb_tpu.ops.stencil_pallas import euler_propagate_pallas

    topo = gridmetrics.topology
    wet = np.asarray(indices.wet3d)
    rng = np.random.default_rng(9)
    chi = np.where(wet, rng.standard_normal(gridmetrics.shape), 0.0)
    dt, nsteps = 120.0, 5

    ref = jnp.asarray(chi)
    for _ in range(nsteps):
        ref = euler_step_pallas(ops.T, ref, dt, topo, interpret=True)
    out = euler_propagate_pallas(ops.T, chi, dt, nsteps, topo,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
