"""Multi-tracer batched kernel: one fused Pallas call propagates B
tracers through the SAME operator, sharing the coefficient streams
(no reference counterpart — the reference applies its sparse matrix one
vector at a time; see ops/stencil_pallas.py batching rationale)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from otmb_tpu.grid.geometry import makegridmetrics
from otmb_tpu.grid.indices import makeindices
from otmb_tpu.models.transport import transportmatrix
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.ops.stencil_pallas import (
    apply_stencil_pallas,
    apply_stencil_pallas_multi,
    euler_step_pallas,
    euler_step_pallas_multi,
)
from otmb_tpu.utils.synthetic import synthetic_dataset


@pytest.fixture(scope="module", params=["bipolar", "tripolar"])
def case(request):
    ds = synthetic_dataset(nx=16, ny=8, nz=6, topology=request.param, seed=5)
    gm = makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon, lat=ds.lat,
        lev=ds.lev, lon_vertices=ds.lon_vertices, lat_vertices=ds.lat_vertices,
    )
    idx = makeindices(gm.v3d)
    phi = facefluxesfrommasstransport(
        umo=ds.umo, vmo=ds.vmo, gridmetrics=gm, indices=idx
    )
    ops = transportmatrix(
        phi=phi, mlotst=ds.mlotst, gridmetrics=gm, indices=idx
    )
    wet = np.asarray(idx.wet3d)
    rng = np.random.default_rng(11)
    chis = np.where(
        wet[None], rng.standard_normal((4,) + gm.shape), 0.0
    ).astype(np.float32)
    c32 = jax.tree_util.tree_map(
        lambda a: a.astype(np.float32), ops.T
    )
    return gm.topology, c32, chis


def test_multi_apply_matches_single(case):
    topo, coeffs, chis = case
    out = np.asarray(apply_stencil_pallas_multi(coeffs, chis, topo))
    for b in range(chis.shape[0]):
        ref = np.asarray(apply_stencil_pallas(coeffs, chis[b], topo))
        np.testing.assert_array_equal(out[b], ref)


def test_multi_euler_step_matches_single(case):
    topo, coeffs, chis = case
    dt = 300.0
    out = np.asarray(euler_step_pallas_multi(coeffs, chis, dt, topo))
    for b in range(chis.shape[0]):
        ref = np.asarray(euler_step_pallas(coeffs, chis[b], dt, topo))
        np.testing.assert_array_equal(out[b], ref)


def test_multi_bf16_coeffs(case):
    """bf16 coefficient streams broadcast across the batch exactly as in
    the single-tracer kernel (f32 tracer/accumulation)."""
    topo, coeffs, chis = case
    c16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), coeffs
    )
    out = np.asarray(apply_stencil_pallas_multi(c16, chis, topo))
    for b in range(chis.shape[0]):
        ref = np.asarray(apply_stencil_pallas(c16, chis[b], topo))
        np.testing.assert_array_equal(out[b], ref)


def test_multi_vmem_fallback(case, monkeypatch):
    """When neither batched kernel's working set fits VMEM the entry
    point scans the single-tracer kernel instead — same results."""
    import otmb_tpu.ops.stencil_pallas as sp

    topo, coeffs, chis = case
    monkeypatch.setattr(sp, "_multi_vmem_ok", lambda *a: False)
    monkeypatch.setattr(sp, "_pick_j_block_multi", lambda *a: None)
    out = np.asarray(sp.apply_stencil_pallas_multi(coeffs, chis, topo))
    for b in range(chis.shape[0]):
        ref = np.asarray(apply_stencil_pallas(coeffs, chis[b], topo))
        np.testing.assert_array_equal(out[b], ref)
    out_e = np.asarray(
        sp.euler_step_pallas_multi(coeffs, chis, 300.0, topo)
    )
    for b in range(chis.shape[0]):
        ref = np.asarray(euler_step_pallas(coeffs, chis[b], 300.0, topo))
        np.testing.assert_array_equal(out_e[b], ref)


def test_multi_rejects_bad_rank(case):
    topo, coeffs, chis = case
    with pytest.raises(ValueError, match="B, nz, ny, nx"):
        apply_stencil_pallas_multi(coeffs, chis[0], topo)


def test_multi_propagation_conserves_mass(case):
    """A batched propagation loop conserves each tracer's volume-weighted
    total independently (CFL-stable step)."""
    topo, coeffs, chis = case
    # volume weights: reconstruct from the synthetic dataset deterministically
    ds = synthetic_dataset(nx=16, ny=8, nz=6, topology=topo.kind, seed=5)
    gm = makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon, lat=ds.lat,
        lev=ds.lev, lon_vertices=ds.lon_vertices, lat_vertices=ds.lat_vertices,
    )
    v = np.nan_to_num(np.asarray(gm.v3d)).astype(np.float64)
    dt = 0.25 / float(np.max(np.abs(np.asarray(coeffs.diag))))

    def body(i, c):
        return euler_step_pallas_multi(coeffs, c, dt, topo)

    out = np.asarray(
        jax.jit(lambda c: jax.lax.fori_loop(0, 50, body, c))(chis)
    )
    for b in range(chis.shape[0]):
        m0 = float((chis[b].astype(np.float64) * v).sum())
        m1 = float((out[b].astype(np.float64) * v).sum())
        scale = float((np.abs(chis[b]).astype(np.float64) * v).sum())
        assert abs(m1 - m0) / scale < 1e-6  # f32 kernel arithmetic


@pytest.fixture(scope="module", params=["bipolar", "tripolar"])
def tall_case(request):
    """ny=16 so by_static=8 gives a genuine multi-block (nb=2) grid."""
    ds = synthetic_dataset(nx=16, ny=16, nz=5, topology=request.param, seed=6)
    gm = makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon, lat=ds.lat,
        lev=ds.lev, lon_vertices=ds.lon_vertices, lat_vertices=ds.lat_vertices,
    )
    idx = makeindices(gm.v3d)
    phi = facefluxesfrommasstransport(
        umo=ds.umo, vmo=ds.vmo, gridmetrics=gm, indices=idx
    )
    ops = transportmatrix(
        phi=phi, mlotst=ds.mlotst, gridmetrics=gm, indices=idx
    )
    wet = np.asarray(idx.wet3d)
    rng = np.random.default_rng(17)
    chis = np.where(
        wet[None], rng.standard_normal((3,) + gm.shape), 0.0
    ).astype(np.float32)
    c32 = jax.tree_util.tree_map(lambda a: a.astype(np.float32), ops.T)
    return gm.topology, c32, chis


def test_blocked_multi_apply_matches_single(tall_case):
    from otmb_tpu.ops.stencil_pallas import _apply_pallas_blocked_multi

    topo, coeffs, chis = tall_case
    out = np.asarray(_apply_pallas_blocked_multi(
        coeffs, chis, topo, None, True, by_static=8
    ))
    for b in range(chis.shape[0]):
        ref = np.asarray(apply_stencil_pallas(
            coeffs, chis[b], topo, interpret=True, variant="blocked",
            by_static=8,
        ))
        np.testing.assert_array_equal(out[b], ref)


def test_blocked_multi_euler_matches_single(tall_case):
    from otmb_tpu.ops.stencil_pallas import _apply_pallas_blocked_multi

    topo, coeffs, chis = tall_case
    out = np.asarray(_apply_pallas_blocked_multi(
        coeffs, chis, topo, 120.0, True, by_static=8
    ))
    for b in range(chis.shape[0]):
        ref = np.asarray(euler_step_pallas(
            coeffs, chis[b], 120.0, topo, interpret=True,
            variant="blocked", by_static=8,
        ))
        np.testing.assert_array_equal(out[b], ref)


def test_propagate_multi_blocked_loop_matches_stepwise(tall_case):
    """The batched loop-optimized blocked propagation (kernel-emitted
    rows, single-use carry) equals per-step batched blocked calls."""
    from otmb_tpu.ops.stencil_pallas import (
        _apply_pallas_blocked_multi,
        _propagate_pallas_blocked_multi,
    )

    topo, coeffs, chis = tall_case
    dt, nsteps = 100.0, 6
    ref = jnp.asarray(chis)
    for _ in range(nsteps):
        ref = _apply_pallas_blocked_multi(coeffs, ref, topo, dt, True,
                                          by_static=8)
    out = _propagate_pallas_blocked_multi(
        coeffs, chis, topo, dt, nsteps, True, by_static=8
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_propagate_multi_public_entry(case):
    """Public euler_propagate_pallas_multi on the small (carry-path) grid
    equals stepwise euler_step_pallas_multi."""
    from otmb_tpu.ops.stencil_pallas import euler_propagate_pallas_multi

    topo, coeffs, chis = case
    dt, nsteps = 150.0, 5
    ref = jnp.asarray(chis)
    for _ in range(nsteps):
        ref = euler_step_pallas_multi(coeffs, ref, dt, topo)
    out = euler_propagate_pallas_multi(coeffs, chis, dt, nsteps, topo)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_propagate_multi_blocked_dispatch(tall_case, monkeypatch):
    """When the full-slab batched working set does not fit, the public
    propagation entry routes to the blocked batched loop."""
    import otmb_tpu.ops.stencil_pallas as sp

    topo, coeffs, chis = tall_case
    monkeypatch.setattr(sp, "_multi_vmem_ok", lambda *a: False)
    out = sp.euler_propagate_pallas_multi(
        coeffs, chis, 100.0, 3, topo, by_static=8
    )
    ref = jnp.asarray(chis)
    for _ in range(3):
        ref = sp._apply_pallas_blocked_multi(coeffs, ref, topo, 100.0,
                                             True, by_static=8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
