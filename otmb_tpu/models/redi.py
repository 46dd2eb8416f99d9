"""Redi isoneutral diffusion as a matrix-free conservative operator.

The reference stops at the experimental GM bolus velocity (RediGM.jl); the
along-isopycnal (Redi) diffusion tensor itself is left unimplemented.
Here it is provided TPU-natively as a finite-volume flux divergence with
the small-slope Redi tensor (Redi 1982), slopes from the same triads and
clamp/taper as the GM path (reference RediGM.jl:52-64):

    K = kappa * [[1,   0,   Sx ],
                 [0,   1,   Sy ],
                 [Sx,  Sy,  S^2]]        (coordinates x, y, zeta=height)

    d(chi)/dt = div(K grad chi)

Discretization: one flux value per face, oriented +x (east faces), +y
(north faces), +zeta/up (top faces); each face value is added to its cell
and subtracted from the neighbor, so

  * total tracer (volume integral) is conserved to roundoff by
    telescoping — including across the periodic boundary and the tripolar
    seam (seam pairs cancel exactly because the cross term is disabled on
    seam faces, where the j-orientation flips);
  * constants are in the null space (all terms are chi-differences).

The stencil is 19-point; the operator is exposed as an apply function (a
RediOperator pytree + `redi_apply`), composable with the 7-point stencil:

    dchi/dt = -apply_stencil(T, chi, topo) + redi_apply(op, chi)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import KAPPA_GM_DEFAULT, MAXSLOPE_DEFAULT
from ..grid.geometry import GridMetrics
from ..grid.topology import GridTopology, neighbor_valid, neighbor_values
from ..ops.derivatives import vertical_face_triad_derivative
from .redigm import slope_taper


def _safe(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


def _masked_mean2(a, b):
    """NaN-aware mean of two one-sided estimates (Julia strong-zero style)."""
    wa = jnp.isfinite(a)
    wb = jnp.isfinite(b)
    return (jnp.where(wa, _safe(a), 0.0) + jnp.where(wb, _safe(b), 0.0)) / (
        jnp.maximum(wa + wb, 1)
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RediOperator:
    """Precomputed face geometry and tapered slopes for `redi_apply`.

    All `a*` factors are exactly zero on faces that touch land or the
    domain boundary, which is what enforces no-flux boundaries.
    """

    ae_over_d: jax.Array  # east faces: kappa * A / d
    ae: jax.Array  # east faces: kappa * A
    s_e: jax.Array  # east-face slope S_x
    an_over_d: jax.Array  # north faces
    an: jax.Array
    s_n: jax.Array
    at_over_dz: jax.Array  # top faces: kappa * A / dz
    at: jax.Array  # top faces: kappa * A
    s_ti: jax.Array  # top-face S_x
    s_tj: jax.Array  # top-face S_y
    dz_up: jax.Array  # |z - z_above|, 1 where no above cell
    dz_dn: jax.Array  # |z_below - z|, 1 where none
    dist_e: jax.Array  # (ny, nx) center-to-east-neighbor distance
    dist_w: jax.Array
    dist_n: jax.Array
    dist_s: jax.Array
    inv_v: jax.Array  # 1/V on wet cells, 0 on land
    wet: jax.Array
    topology: GridTopology = dataclasses.field(metadata=dict(static=True))


def build_redi_operator(
    rho,
    gridmetrics: GridMetrics,
    wet3d,
    kappa_redi: float = KAPPA_GM_DEFAULT,
    maxslope: float = MAXSLOPE_DEFAULT,
) -> RediOperator:
    """Precompute geometry and density slopes for the Redi operator."""
    gm = gridmetrics
    topo = gm.topology
    wet = jnp.asarray(wet3d, bool)
    ny = topo.ny

    # Cell-centered isoneutral slopes, clamped + tapered (RediGM.jl:56-64).
    # The triad returns rho_x / rho_zeta; the isopycnal-surface slope of
    # the rotated tensor is S_x = -rho_x / rho_zeta, hence the negation.
    s_i = -vertical_face_triad_derivative(rho, gm, "i", wet)
    s_j = -vertical_face_triad_derivative(rho, gm, "j", wet)
    s_i = jnp.clip(_safe(s_i), -maxslope, maxslope)
    s_j = jnp.clip(_safe(s_j), -maxslope, maxslope)
    taper = slope_taper(s_i, s_j)
    s_i = taper * s_i
    s_j = taper * s_j

    def face_mean(x, direction):
        return 0.5 * (x + _safe(neighbor_values(x, direction, topo, fill=jnp.nan)))

    # --- east faces ---
    e_wet = wet & neighbor_values(wet, "east", topo, fill=False)
    thk_e = jnp.minimum(
        gm.thkcello, neighbor_values(gm.thkcello, "east", topo, fill=jnp.nan)
    )
    area_e = jnp.where(e_wet, thk_e * gm.edge_length["east"], 0.0)
    ae = kappa_redi * _safe(area_e)
    ae_over_d = _safe(ae / gm.distance_to_neighbour["east"])
    s_e = jnp.where(e_wet, face_mean(s_i, "east"), 0.0)

    # --- north faces ---
    n_wet = (
        wet
        & neighbor_values(wet, "north", topo, fill=False)
        & neighbor_valid("north", topo)
    )
    thk_n = jnp.minimum(
        gm.thkcello, neighbor_values(gm.thkcello, "north", topo, fill=jnp.nan)
    )
    area_n = jnp.where(n_wet, thk_n * gm.edge_length["north"], 0.0)
    an = kappa_redi * _safe(area_n)
    an_over_d = _safe(an / gm.distance_to_neighbour["north"])
    s_n = jnp.where(n_wet, face_mean(s_j, "north"), 0.0)
    if topo.is_tripolar:
        # Across the seam the j-orientation flips, which would break the
        # antisymmetric pairing of the cross term; disable it there (the
        # pure horizontal part remains and pairs exactly).
        seam_mask = jnp.ones((ny, 1), bool).at[ny - 1].set(False).reshape(1, ny, 1)
        s_n = jnp.where(seam_mask, s_n, 0.0)

    # --- top faces (between each cell and the one above) ---
    t_wet = wet & neighbor_values(wet, "top", topo, fill=False)
    z = gm.z3d
    dz_up = jnp.abs(neighbor_values(z, "top", topo, fill=jnp.nan) - z)
    dz_up_safe = jnp.where(t_wet, dz_up, 1.0)
    dz_dn = jnp.abs(neighbor_values(z, "bottom", topo, fill=jnp.nan) - z)
    dz_dn_safe = jnp.where(jnp.isfinite(dz_dn), dz_dn, 1.0)
    at = jnp.where(t_wet, kappa_redi * gm.area2d, 0.0)
    at_over_dz = at / dz_up_safe
    s_ti = jnp.where(t_wet, face_mean(s_i, "top"), 0.0)
    s_tj = jnp.where(t_wet, face_mean(s_j, "top"), 0.0)

    return RediOperator(
        ae_over_d=ae_over_d, ae=ae, s_e=s_e,
        an_over_d=an_over_d, an=an, s_n=s_n,
        at_over_dz=at_over_dz, at=at, s_ti=s_ti, s_tj=s_tj,
        dz_up=dz_up_safe, dz_dn=dz_dn_safe,
        dist_e=gm.distance_to_neighbour["east"],
        dist_w=gm.distance_to_neighbour["west"],
        dist_n=gm.distance_to_neighbour["north"],
        dist_s=gm.distance_to_neighbour["south"],
        inv_v=jnp.where(wet, 1.0 / gm.v3d, 0.0),
        wet=wet,
        topology=topo,
    )


@jax.jit
def redi_apply(op: RediOperator, chi):
    """d(chi)/dt contribution of Redi isoneutral diffusion (chi/s)."""
    topo = op.topology
    chi = jnp.asarray(chi)
    chif = jnp.where(op.wet, chi, jnp.nan)

    nb = lambda d: neighbor_values(chif, d, topo, fill=jnp.nan)

    # Cell-centered derivatives (NaN-aware mean of one-sided estimates).
    # zeta (height, up-positive): (chi_above - chi)/dz is already d/dzeta.
    dcz = _masked_mean2((nb("top") - chif) / op.dz_up, (chif - nb("bottom")) / op.dz_dn)
    dcx = _masked_mean2((nb("east") - chif) / op.dist_e, (chif - nb("west")) / op.dist_w)
    dcy = _masked_mean2((nb("north") - chif) / op.dist_n, (chif - nb("south")) / op.dist_s)

    # --- east-face flux (+x orientation) ---
    de = _safe(nb("east") - chif)
    dcz_e = 0.5 * (dcz + _safe(neighbor_values(dcz, "east", topo, fill=jnp.nan)))
    f_e = op.ae_over_d * de + op.ae * op.s_e * dcz_e

    # --- north-face flux (+y orientation; seam cross term disabled) ---
    dn = _safe(nb("north") - chif)
    dcz_n = 0.5 * (dcz + _safe(neighbor_values(dcz, "north", topo, fill=jnp.nan)))
    f_n = op.an_over_d * dn + op.an * op.s_n * dcz_n

    # --- top-face flux (+zeta / upward orientation) ---
    dt_ = _safe(nb("top") - chif)  # (chi_above - chi)
    dcx_t = 0.5 * (dcx + _safe(neighbor_values(dcx, "top", topo, fill=jnp.nan)))
    dcy_t = 0.5 * (dcy + _safe(neighbor_values(dcy, "top", topo, fill=jnp.nan)))
    s2 = op.s_ti**2 + op.s_tj**2
    f_t = op.at * (op.s_ti * dcx_t + op.s_tj * dcy_t) + op.at_over_dz * s2 * dt_

    # Divergence: + own outward faces, - the shared faces owned by the
    # west/south/below neighbors.
    f_e_w = neighbor_values(f_e, "west", topo, fill=0.0)
    f_n_s = neighbor_values(f_n, "south", topo, fill=0.0)
    f_t_b = neighbor_values(f_t, "bottom", topo, fill=0.0)

    return op.inv_v * (f_e - f_e_w + f_n - f_n_s + f_t - f_t_b)
