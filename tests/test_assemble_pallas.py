"""Fused Pallas assembly kernel vs the XLA pass pipeline (interpret mode).

The kernel must reproduce `assemble_transport(...).T` — itself
oracle-tested against literal reference loops in test_operator_parity.py —
for both topologies, both advection schemes, and explicit wet masks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from otmb_tpu.models.transport import assemble_transport
from otmb_tpu.ops.assemble_pallas import assemble_T_pallas


def _reference_T(dataset, gridmetrics, indices, upwind, **kw):
    return assemble_transport(
        jnp.nan_to_num(jnp.asarray(dataset.umo)),
        jnp.nan_to_num(jnp.asarray(dataset.vmo)),
        dataset.mlotst,
        gridmetrics,
        indices.wet3d,
        upwind=upwind,
        **kw,
    ).T


@pytest.mark.parametrize("upwind", [True, False], ids=["upwind", "centered"])
def test_fused_assembly_matches_pipeline(dataset, gridmetrics, indices, upwind):
    ref = _reference_T(dataset, gridmetrics, indices, upwind)
    out = assemble_T_pallas(
        jnp.nan_to_num(jnp.asarray(dataset.umo)),
        jnp.nan_to_num(jnp.asarray(dataset.vmo)),
        dataset.mlotst,
        gridmetrics,
        wet3d=indices.wet3d,
        upwind=upwind,
        interpret=True,
    )
    for leg in ref._fields:
        np.testing.assert_allclose(
            np.asarray(out[leg]), np.asarray(ref[leg]),
            rtol=1e-12, atol=1e-18, err_msg=leg,
        )


def test_fused_assembly_f32(dataset, gridmetrics, indices):
    """The TPU path runs float32; agreement at f32 tolerances."""
    import jax

    gm32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "astype") else x, gridmetrics
    )
    umo = jnp.nan_to_num(jnp.asarray(dataset.umo, jnp.float32))
    vmo = jnp.nan_to_num(jnp.asarray(dataset.vmo, jnp.float32))
    ml = jnp.asarray(dataset.mlotst, jnp.float32)

    ref = assemble_transport(umo, vmo, ml, gm32, indices.wet3d).T
    out = assemble_T_pallas(umo, vmo, ml, gm32, wet3d=indices.wet3d, interpret=True)
    for leg in ref._fields:
        np.testing.assert_allclose(
            np.asarray(out[leg]), np.asarray(ref[leg]),
            rtol=2e-5, atol=1e-12, err_msg=leg,
        )


def test_fused_assembly_default_wet_mask(dataset, gridmetrics, indices):
    """wet3d=None means the NaN pattern of v3d (the makeindices convention)."""
    umo = jnp.nan_to_num(jnp.asarray(dataset.umo))
    vmo = jnp.nan_to_num(jnp.asarray(dataset.vmo))
    a = assemble_T_pallas(umo, vmo, dataset.mlotst, gridmetrics, interpret=True)
    b = assemble_T_pallas(
        umo, vmo, dataset.mlotst, gridmetrics, wet3d=indices.wet3d, interpret=True
    )
    for leg in a._fields:
        np.testing.assert_allclose(np.asarray(a[leg]), np.asarray(b[leg]), err_msg=leg)


@pytest.mark.parametrize("upwind", [True, False], ids=["upwind", "centered"])
@pytest.mark.parametrize("by", [2, 7])
def test_fused_assembly_blocked(dataset, gridmetrics, indices, upwind, by):
    """The j-blocked kernel (0.25-degree VMEM regime) matches the pipeline
    for block sizes that exercise interior and boundary halo rows
    (the fixture grid has ny=14; blocks must tile ny)."""
    ref = _reference_T(dataset, gridmetrics, indices, upwind)
    out = assemble_T_pallas(
        jnp.nan_to_num(jnp.asarray(dataset.umo)),
        jnp.nan_to_num(jnp.asarray(dataset.vmo)),
        dataset.mlotst,
        gridmetrics,
        wet3d=indices.wet3d,
        upwind=upwind,
        interpret=True,
        by_static=by,
    )
    for leg in ref._fields:
        np.testing.assert_allclose(
            np.asarray(out[leg]), np.asarray(ref[leg]),
            rtol=1e-12, atol=1e-18, err_msg=leg,
        )


def _rho3d(gridmetrics, indices):
    """A laterally- and vertically-varying density, NaN on land (the
    reference's main rho mode, matrixbuilding.jl:221-225)."""
    return jnp.where(
        indices.wet3d,
        1030.0 + 0.01 * gridmetrics.z3d
        + 0.5 * jnp.cos(2 * jnp.deg2rad(gridmetrics.lon))
        + 0.3 * jnp.sin(3 * jnp.deg2rad(gridmetrics.lat)),
        jnp.nan,
    )


def _no_fallback(monkeypatch):
    """Make any fallback to the XLA pipeline a test failure."""
    import otmb_tpu.models.transport as mt

    def _fail(*a, **k):
        pytest.fail("assemble_T_pallas fell back to the XLA pipeline")

    monkeypatch.setattr(mt, "assemble_transport", _fail)


@pytest.mark.parametrize("upwind", [True, False], ids=["upwind", "centered"])
def test_fused_assembly_3d_rho_kernel(dataset, gridmetrics, indices, upwind,
                                      monkeypatch):
    """3D density runs through the kernel path (per-face pair-mean
    masses streamed in-kernel), exact against the oracle-tested
    pipeline."""
    rho3d = _rho3d(gridmetrics, indices)
    ref = _reference_T(dataset, gridmetrics, indices, upwind, rho=rho3d)
    _no_fallback(monkeypatch)
    out = assemble_T_pallas(
        jnp.nan_to_num(jnp.asarray(dataset.umo)),
        jnp.nan_to_num(jnp.asarray(dataset.vmo)),
        dataset.mlotst,
        gridmetrics,
        wet3d=indices.wet3d,
        rho=rho3d,
        upwind=upwind,
        interpret=True,
    )
    for leg in ref._fields:
        np.testing.assert_allclose(
            np.asarray(out[leg]), np.asarray(ref[leg]),
            rtol=1e-12, atol=1e-18, err_msg=leg,
        )


@pytest.mark.parametrize("by", [2, 7])
def test_fused_assembly_3d_rho_blocked(dataset, gridmetrics, indices, by,
                                       monkeypatch):
    """3D density through the j-blocked kernel (0.25-degree VMEM regime),
    exercising the rho halo rows at block boundaries and the seam."""
    rho3d = _rho3d(gridmetrics, indices)
    ref = _reference_T(dataset, gridmetrics, indices, True, rho=rho3d)
    _no_fallback(monkeypatch)
    out = assemble_T_pallas(
        jnp.nan_to_num(jnp.asarray(dataset.umo)),
        jnp.nan_to_num(jnp.asarray(dataset.vmo)),
        dataset.mlotst,
        gridmetrics,
        wet3d=indices.wet3d,
        rho=rho3d,
        interpret=True,
        by_static=by,
    )
    for leg in ref._fields:
        np.testing.assert_allclose(
            np.asarray(out[leg]), np.asarray(ref[leg]),
            rtol=1e-12, atol=1e-18, err_msg=leg,
        )


def test_fused_assembly_traced_kappa_falls_back(dataset, gridmetrics, indices):
    """Traced physics scalars still route through the XLA pipeline and
    agree with it (jit-compatible assembly with swept parameters)."""
    import jax

    umo = jnp.nan_to_num(jnp.asarray(dataset.umo))
    vmo = jnp.nan_to_num(jnp.asarray(dataset.vmo))
    ref = _reference_T(dataset, gridmetrics, indices, True, kappa_h=750.0)
    out = jax.jit(
        lambda kh: assemble_T_pallas(
            umo, vmo, dataset.mlotst, gridmetrics, wet3d=indices.wet3d,
            kappa_h=kh, interpret=True,
        )
    )(750.0)
    for leg in ref._fields:
        np.testing.assert_allclose(
            np.asarray(out[leg]), np.asarray(ref[leg]), rtol=1e-12, err_msg=leg
        )
