"""The transport-operator front door: T = Tadv + TkH + TkVML + TkVdeep.

Counterpart of the reference `transportmatrix` (matrixbuilding.jl:128-150)
with identical physics defaults, producing stencil-coefficient operators
(ops/coeffs.py) instead of host sparse matrices. Each component can be
passed in pre-built, as in the reference.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp

from ..config import (
    KAPPA_H_DEFAULT,
    KAPPA_VDEEP_DEFAULT,
    KAPPA_VML_DEFAULT,
    RHO_DEFAULT,
)
from ..grid.geometry import GridMetrics
from ..grid.indices import Indices
from ..ops.coeffs import (
    StencilCoeffs,
    add_coeffs,
    advection_coeffs,
    horizontal_diffusion_coeffs,
    mixed_layer_mask,
    vertical_diffusion_coeffs,
)
from ..ops.fluxes import FaceFluxes

logger = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TransportOperators:
    """The total operator and its four components (reference's named tuple
    return, matrixbuilding.jl:149)."""

    T: StencilCoeffs
    Tadv: StencilCoeffs
    TkH: StencilCoeffs
    TkVML: StencilCoeffs
    TkVdeep: StencilCoeffs


def buildTadv(*, phi: FaceFluxes, gridmetrics: GridMetrics, indices: Indices,
              rho=RHO_DEFAULT, upwind: bool = True) -> StencilCoeffs:
    """Advection operator (reference buildTadv, matrixbuilding.jl:31-44)."""
    logger.debug("Building Tadv")
    c = advection_coeffs(phi, gridmetrics, indices.wet3d, rho, upwind=upwind)
    return _checked(c, "Tadv")


def buildTkH(*, gridmetrics: GridMetrics, indices: Indices,
             kappa_h=KAPPA_H_DEFAULT) -> StencilCoeffs:
    """Horizontal diffusion (reference buildTkappaH, matrixbuilding.jl:51-66)."""
    logger.debug("Building TkH")
    c = horizontal_diffusion_coeffs(gridmetrics, indices.wet3d, kappa_h)
    return _checked(c, "TkH")


def buildTkVML(*, mlotst, gridmetrics: GridMetrics, indices: Indices,
               kappa_vml=KAPPA_VML_DEFAULT) -> StencilCoeffs:
    """Mixed-layer vertical diffusion (reference buildTkappaVML,
    matrixbuilding.jl:74-95): active where zt[k] < mlotst."""
    logger.debug("Building TkVML")
    omega = mixed_layer_mask(gridmetrics, mlotst)
    c = vertical_diffusion_coeffs(gridmetrics, indices.wet3d, kappa_vml, omega)
    return _checked(c, "TkVML")


def buildTkVdeep(*, gridmetrics: GridMetrics, indices: Indices,
                 kappa_vdeep=KAPPA_VDEEP_DEFAULT) -> StencilCoeffs:
    """Background vertical diffusion (reference buildTkappaVdeep,
    matrixbuilding.jl:103-120): whole-ocean mask."""
    logger.debug("Building TkVdeep")
    c = vertical_diffusion_coeffs(gridmetrics, indices.wet3d, kappa_vdeep, None)
    return _checked(c, "TkVdeep")


def _checked(c: StencilCoeffs, name: str) -> StencilCoeffs:
    """NaN guard, mirroring the reference's `any(isnan.(Tvals)) && error`
    (matrixbuilding.jl:39,61,90,114). Host-side eager check; skipped when
    tracing (assembly is normally eager preprocessing)."""
    import numpy as np

    if not isinstance(jnp.asarray(c.diag), jax.core.Tracer):
        for leg, arr in zip(c._fields, c):
            if not np.all(np.isfinite(np.asarray(arr))):
                raise FloatingPointError(f"{name}.{leg} contains non-finite values")
    return c


def assemble_transport(
    umo,
    vmo,
    mlotst,
    gridmetrics: GridMetrics,
    wet3d,
    rho=RHO_DEFAULT,
    kappa_h=KAPPA_H_DEFAULT,
    kappa_vml=KAPPA_VML_DEFAULT,
    kappa_vdeep=KAPPA_VDEEP_DEFAULT,
    upwind: bool = True,
) -> TransportOperators:
    """Fully jittable end-to-end assembly: raw transports -> all operators.

    Same physics as `transportmatrix` but takes plain arrays (no host-side
    `Indices`), so it can be jit/pjit-compiled as one fused program — the
    TPU 'assembly' hot path (a handful of elementwise passes + one cumsum).
    """
    from ..ops.fluxes import facefluxes

    phi = facefluxes(umo, vmo, wet3d, gridmetrics.topology)
    Tadv = advection_coeffs(phi, gridmetrics, wet3d, rho, upwind=upwind)
    TkH = horizontal_diffusion_coeffs(gridmetrics, wet3d, kappa_h)
    TkVML = vertical_diffusion_coeffs(
        gridmetrics, wet3d, kappa_vml, mixed_layer_mask(gridmetrics, mlotst)
    )
    TkVdeep = vertical_diffusion_coeffs(gridmetrics, wet3d, kappa_vdeep, None)
    T = add_coeffs(Tadv, TkH, TkVML, TkVdeep)
    return TransportOperators(T=T, Tadv=Tadv, TkH=TkH, TkVML=TkVML, TkVdeep=TkVdeep)


def transportmatrix(
    *,
    phi: FaceFluxes,
    mlotst,
    gridmetrics: GridMetrics,
    indices: Indices,
    rho=RHO_DEFAULT,
    kappa_h=KAPPA_H_DEFAULT,
    kappa_vml=KAPPA_VML_DEFAULT,
    kappa_vdeep=KAPPA_VDEEP_DEFAULT,
    Tadv: StencilCoeffs | None = None,
    TkH: StencilCoeffs | None = None,
    TkVML: StencilCoeffs | None = None,
    TkVdeep: StencilCoeffs | None = None,
    upwind: bool = True,
) -> TransportOperators:
    """Build the flux-divergence operator T (units 1/s, d(chi)/dt = -T chi).

    Signature, defaults, and semantics mirror the reference
    `transportmatrix` (matrixbuilding.jl:128-150).
    """
    if Tadv is None:
        Tadv = buildTadv(
            phi=phi, gridmetrics=gridmetrics, indices=indices, rho=rho, upwind=upwind
        )
    if TkH is None:
        TkH = buildTkH(gridmetrics=gridmetrics, indices=indices, kappa_h=kappa_h)
    if TkVML is None:
        TkVML = buildTkVML(
            mlotst=mlotst, gridmetrics=gridmetrics, indices=indices,
            kappa_vml=kappa_vml,
        )
    if TkVdeep is None:
        TkVdeep = buildTkVdeep(
            gridmetrics=gridmetrics, indices=indices, kappa_vdeep=kappa_vdeep
        )

    T = add_coeffs(Tadv, TkH, TkVML, TkVdeep)
    return TransportOperators(T=T, Tadv=Tadv, TkH=TkH, TkVML=TkVML, TkVdeep=TkVdeep)
