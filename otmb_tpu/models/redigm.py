"""Gent-McWilliams bolus velocity from density slopes (experimental).

Capability parity with the reference src/RediGM.jl:46-79: isoneutral
slopes from vertical-face triads, slope clamping, tanh taper, and a
vertical dyad derivative of kappa_GM * S. Like the reference, this is
flagged experimental; it exists so Redi/GM stencils can extend the
transport operator.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import (
    KAPPA_GM_DEFAULT,
    MAXSLOPE_DEFAULT,
    SLOPE_TAPER_SC,
    SLOPE_TAPER_SD,
)
from ..grid.geometry import GridMetrics
from ..ops.derivatives import (
    vertical_dyad_derivative,
    vertical_face_triad_derivative,
)


def density_slopes(rho, gridmetrics: GridMetrics, wet3d=None):
    """Isoneutral density slopes (S_i, S_j) via vertical-face triads
    (reference RediGM.jl:52-53)."""
    s_i = vertical_face_triad_derivative(rho, gridmetrics, "i", wet3d)
    s_j = vertical_face_triad_derivative(rho, gridmetrics, "j", wet3d)
    return s_i, s_j


def potential_density_slope(eos, so, ct, gridmetrics: GridMetrics,
                            direction: str, wet3d=None):
    """Isoneutral slope of the *locally referenced* potential density.

    Mirrors `localpotentialdensityslope` / `globalpotentialdensityslope`
    (reference RediGM.jl:17-35): for every center cell, the equation of
    state `eos(so, ct, zref)` is evaluated at all 6 triad-group members
    using the CENTER cell's depth as the common reference `zref` — so
    each center sees a different density at the same neighbor, removing
    the compressibility contribution from the slope. `eos` is any
    elementwise callable (the reference uses GibbsSeaWater's gsw_rho;
    pass e.g. a TEOS-10 polynomial or a linear EOS).
    """
    from ..ops.derivatives import (
        vertical_face_triad_derivative_group,
        vertical_face_triad_group_values,
    )

    so_g = vertical_face_triad_group_values(so, gridmetrics, direction)
    ct_g = vertical_face_triad_group_values(ct, gridmetrics, direction)
    zref = gridmetrics.z3d  # center depth, common to the whole group
    vals = {tag: eos(so_g[tag], ct_g[tag], zref) for tag in so_g}
    return vertical_face_triad_derivative_group(
        vals, gridmetrics, direction, wet3d
    )


def potential_density_slopes(eos, so, ct, gridmetrics: GridMetrics, wet3d=None):
    """(S_i, S_j) from the locally referenced potential density — the
    potential-density analogue of `density_slopes` (RediGM.jl:25-35)."""
    s_i = potential_density_slope(eos, so, ct, gridmetrics, "i", wet3d)
    s_j = potential_density_slope(eos, so, ct, gridmetrics, "j", wet3d)
    return s_i, s_j


def slope_taper(s_i, s_j, sc: float = SLOPE_TAPER_SC, sd: float = SLOPE_TAPER_SD):
    """Danabasoglu-McWilliams-style tanh taper
    0.5 * (1 + tanh((Sc - |S|) / Sd)) (reference RediGM.jl:59-62)."""
    return 0.5 * (1.0 + jnp.tanh((sc - jnp.sqrt(s_i**2 + s_j**2)) / sd))


def bolus_gm_velocity(
    rho,
    gridmetrics: GridMetrics,
    wet3d=None,
    kappa_gm: float = KAPPA_GM_DEFAULT,
    maxslope: float = MAXSLOPE_DEFAULT,
):
    """Bolus velocity (u, v) of the GM parameterization from the density
    field, mirroring `bolus_GM_velocity` (RediGM.jl:46-79):

      1. triad density slopes, clamped to +-maxslope;
      2. tanh taper on the slope magnitude (Sc=0.004, Sd=0.001);
      3. u = d/dz (kappa_GM * S_i), v = d/dz (kappa_GM * S_j) via the
         vertical dyad derivative.
    """
    s_i, s_j = density_slopes(rho, gridmetrics, wet3d)
    s_i = jnp.clip(s_i, -maxslope, maxslope)
    s_j = jnp.clip(s_j, -maxslope, maxslope)

    taper = slope_taper(s_i, s_j)
    s_i = taper * s_i
    s_j = taper * s_j

    u = vertical_dyad_derivative(kappa_gm * s_i, gridmetrics, wet3d)
    v = vertical_dyad_derivative(kappa_gm * s_j, gridmetrics, wet3d)
    return u, v


def add_bolus_transports(
    umo,
    vmo,
    rho,
    gridmetrics: GridMetrics,
    wet3d=None,
    kappa_gm: float = KAPPA_GM_DEFAULT,
    maxslope: float = MAXSLOPE_DEFAULT,
    rho_flux=None,
):
    """Add the GM bolus mass transports to resolved umo/vmo.

    Composes the bolus velocity with `velocity2fluxes`, so the eddy
    (bolus) advection enters the transport operator through the same
    six-face flux closure as the resolved flow — the operator then carries
    resolved + eddy-induced advection (the reference exposes the bolus
    velocity but leaves the composition to the user; here it is one call).

    `rho_flux` is the density used in the velocity->flux conversion
    (defaults to the 3D `rho` used for the slopes; a scalar is fine).
    Returns (umo_total, vmo_total).
    """
    import jax.numpy as jnp

    from ..ops.velocities import velocity2fluxes

    u_b, v_b = bolus_gm_velocity(
        rho, gridmetrics, wet3d, kappa_gm=kappa_gm, maxslope=maxslope
    )
    # NaN bolus (land / missing-leg cells) means "no eddy transport".
    u_b = jnp.where(jnp.isfinite(u_b), u_b, 0.0)
    v_b = jnp.where(jnp.isfinite(v_b), v_b, 0.0)

    rho_f = rho if rho_flux is None else rho_flux
    # Bolus velocities live on the default C-grid faces already; lon/lat
    # of the points are irrelevant for the C-grid (identity) path.
    phi_i, phi_j = velocity2fluxes(
        u_b, None, None, v_b, None, None, gridmetrics, rho_f,
        arakawa_kind="C",
    )
    phi_i = jnp.where(jnp.isfinite(phi_i), phi_i, 0.0)
    phi_j = jnp.where(jnp.isfinite(phi_j), phi_j, 0.0)
    return jnp.asarray(umo) + phi_i, jnp.asarray(vmo) + phi_j
