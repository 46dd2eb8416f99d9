"""The reference CI's operator invariants, ported verbatim.

Reference /root/reference/test/online.jl:106-123 asserts, for the
operator built from real ACCESS-ESM1-5 output:

  - divergence timescale ||1|| / ||T 1|| > 1 Myr for every DIFFUSIVE
    operator (TkH, TkVML, TkVdeep)                      (online.jl:110-112)
  - volume-conservation timescale ||v|| / ||T' v|| > 1 Myr for ALL
    operators (Tadv, TkH, TkVML, TkVdeep, T)            (online.jl:114-117)
  - upwind T sign structure: diagonal > 0, off-diagonal <= 0
                                                        (online.jl:119-123)

Here the same assertions run on the synthetic CMIP-shaped grids, for
both bipolar and tripolar topologies (the `dataset` fixture is
parameterized over both).
"""

import numpy as np

from otmb_tpu.ops.apply import operator_diagnostics
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.models.transport import transportmatrix

MYR = 1e6 * 365.25 * 24 * 3600  # seconds


def _operators(dataset, gridmetrics, indices):
    phi = facefluxesfrommasstransport(
        umo=dataset.umo, vmo=dataset.vmo, gridmetrics=gridmetrics,
        indices=indices,
    )
    return transportmatrix(
        phi=phi, mlotst=dataset.mlotst, gridmetrics=gridmetrics,
        indices=indices,
    )


def test_divergence_timescale_diffusive_operators(dataset, gridmetrics,
                                                  indices):
    """tau_div = ||1|| / ||T 1|| > 1 Myr for TkH, TkVML, TkVdeep
    (reference test/online.jl:110-112). Diffusion redistributes tracer
    without creating it, so a uniform field must be (near-)invariant."""
    ops = _operators(dataset, gridmetrics, indices)
    v3d = np.asarray(gridmetrics.v3d)
    wet = np.asarray(indices.wet3d)
    for name in ("TkH", "TkVML", "TkVdeep"):
        d = operator_diagnostics(
            getattr(ops, name), v3d, wet, gridmetrics.topology
        )
        tau_div = float(d["tau_div_s"])
        assert tau_div / MYR > 1.0, (
            f"{name}: tau_div = {tau_div / MYR:.3g} Myr <= 1 Myr"
        )


def test_volume_conservation_timescale_all_operators(dataset, gridmetrics,
                                                     indices):
    """tau_vol = ||v|| / ||T' v|| > 1 Myr for Tadv, TkH, TkVML, TkVdeep
    and the total T (reference test/online.jl:114-117)."""
    ops = _operators(dataset, gridmetrics, indices)
    v3d = np.asarray(gridmetrics.v3d)
    wet = np.asarray(indices.wet3d)
    for name in ("Tadv", "TkH", "TkVML", "TkVdeep", "T"):
        d = operator_diagnostics(
            getattr(ops, name), v3d, wet, gridmetrics.topology
        )
        tau_vol = float(d["tau_vol_s"])
        assert tau_vol / MYR > 1.0, (
            f"{name}: tau_vol = {tau_vol / MYR:.3g} Myr <= 1 Myr"
        )


def test_upwind_sign_structure(dataset, gridmetrics, indices):
    """Upwind T has diag > 0 and off-diagonal <= 0 on wet cells
    (reference test/online.jl:119-123)."""
    ops = _operators(dataset, gridmetrics, indices)
    wet = np.asarray(indices.wet3d)
    diag = np.asarray(ops.T.diag)
    assert (diag[wet] > 0).all()
    for leg in ("east", "west", "north", "south", "top", "bottom"):
        offdiag = np.asarray(getattr(ops.T, leg))
        assert (offdiag[wet] <= 0).all(), f"positive {leg} off-diagonal"
