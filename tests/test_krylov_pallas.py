"""Fused Krylov-step kernel (ops/krylov_pallas.py): z/out/dot must match
the composition of the separate passes it replaces — vector combination,
tridiag Thomas solve (ops/tridiag_pallas.py), 7-point stencil apply
(ops/stencil_pallas.py), and the jnp dot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otmb_tpu.grid.topology import GridTopology
from otmb_tpu.ops.coeffs import StencilCoeffs
from otmb_tpu.ops.krylov_pallas import fused_krylov_step
from otmb_tpu.ops.stencil_pallas import apply_stencil_pallas
from otmb_tpu.ops.tridiag_pallas import tridiag_solve_pallas


def _case(nz, ny, nx, kind, seed=0, land=True):
    topo = GridTopology(kind=kind, nx=nx, ny=ny, nz=nz)
    rng = np.random.default_rng(seed)
    wet = np.ones((nz, ny, nx), bool)
    if land:
        wet[:, ny // 3, : nx // 4] = False          # a land strip
        wet[nz // 2 :, ny // 2, nx // 2] = False    # partial column
        wet[:, 1, 1] = False                        # full land column
    w = wet.astype(np.float32)

    def f():
        return (w * rng.standard_normal((nz, ny, nx))).astype(np.float32)

    coeffs = StencilCoeffs(
        diag=jnp.asarray(2.0 + np.abs(f())),
        east=jnp.asarray(0.1 * f()), west=jnp.asarray(0.1 * f()),
        north=jnp.asarray(0.1 * f()), south=jnp.asarray(0.1 * f()),
        top=jnp.asarray(0.1 * f()), bottom=jnp.asarray(0.1 * f()),
    )
    # zero all coefficients on land (operator invariant)
    coeffs = jax.tree_util.tree_map(lambda a: a * w, coeffs)
    # tridiag streams: sub/super from the operator's vertical legs,
    # diagonal guarded on land exactly as _tridiag_preconditioner does
    m_lo, m_up = coeffs.bottom, coeffs.top
    m_di = jnp.where(coeffs.diag != 0, coeffs.diag, 1.0)
    x1, x2, rhat = jnp.asarray(f()), jnp.asarray(f()), jnp.asarray(f())
    return topo, coeffs, m_lo, m_di, m_up, x1, x2, rhat


def _reference(topo, coeffs, m_lo, m_di, m_up, z, rhat):
    mv = tridiag_solve_pallas(m_lo, m_di, m_up, z, interpret=True)
    out = apply_stencil_pallas(coeffs, mv, topo, interpret=True)
    return out, jnp.vdot(rhat, out)


@pytest.mark.parametrize("kind", ["tripolar", "bipolar"])
@pytest.mark.parametrize("by", [None, 8])
def test_fused_matches_composition(kind, by):
    nz, ny, nx = 7, 16, 24
    topo, coeffs, m_lo, m_di, m_up, x1, x2, rhat = _case(nz, ny, nx, kind)
    c2 = np.float32(-0.37)
    z, out, d = fused_krylov_step(
        coeffs, m_lo, m_di, m_up, x1, x2, c2, rhat, topo,
        interpret=True, by_static=by,
    )
    z_ref = x1 + c2 * x2
    # 1-ulp FMA/ordering differences between the in-kernel combination
    # and the XLA reference are expected
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-6, atol=1e-6)
    out_ref, d_ref = _reference(topo, coeffs, m_lo, m_di, m_up, z_ref, rhat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(float(d), float(d_ref), rtol=1e-4)


def test_fused_no_combine_no_dot():
    nz, ny, nx = 5, 8, 16
    topo, coeffs, m_lo, m_di, m_up, x1, _, rhat = _case(
        nz, ny, nx, "tripolar", seed=3)
    z, out, d = fused_krylov_step(
        coeffs, m_lo, m_di, m_up, x1, None, 0.0, None, topo,
        interpret=True, with_combine=False, with_dot=False,
    )
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x1))
    assert d is None
    out_ref, _ = _reference(topo, coeffs, m_lo, m_di, m_up, x1, rhat)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-5, atol=1e-5)


def test_fused_land_stays_zero():
    nz, ny, nx = 6, 16, 16
    topo, coeffs, m_lo, m_di, m_up, x1, x2, rhat = _case(
        nz, ny, nx, "bipolar", seed=5)
    wet = np.asarray(coeffs.diag) != 0
    z, out, _ = fused_krylov_step(
        coeffs, m_lo, m_di, m_up, x1, x2, np.float32(0.5), rhat, topo,
        interpret=True, by_static=8,
    )
    assert np.all(np.asarray(out)[~wet] == 0.0)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_multi_block_equals_single_block():
    """The halo-row machinery (outside Thomas rows) must make nb=2
    bitwise-identical to nb=1 on the same inputs."""
    nz, ny, nx = 7, 16, 24
    topo, coeffs, m_lo, m_di, m_up, x1, x2, rhat = _case(
        nz, ny, nx, "tripolar", seed=9)
    c2 = np.float32(1.25)
    _, out1, d1 = fused_krylov_step(
        coeffs, m_lo, m_di, m_up, x1, x2, c2, rhat, topo,
        interpret=True, by_static=16,
    )
    _, out2, d2 = fused_krylov_step(
        coeffs, m_lo, m_di, m_up, x1, x2, c2, rhat, topo,
        interpret=True, by_static=8,
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_allclose(float(d1), float(d2), rtol=1e-6)
