"""Transport-operator assembly as dense stencil coefficients.

The reference assembles T as a host-side sparse COO->CSC matrix with <= 7
nonzeros per row (src/matrixbuilding.jl:226-479). On TPU the operator is
never materialized: T is represented by seven dense (nz, ny, nx)
coefficient arrays — one per stencil leg — so that

    (T @ chi)[c] = diag[c] * chi[c]
                 + sum_d coef[d][c] * chi[neighbor_d(c)]

with the neighbor map (periodic i, tripolar fold) applied by the gather in
`ops/apply.py`. Assembly itself is a handful of fused elementwise passes.

Semantics mirror the reference exactly; in particular the donor-side
diagonal contributions of the advection scheme
(`pushTadvectionvalues!`, matrixbuilding.jl:193-204) are re-derived in
*cell-local* form: for cell c, every neighbor that receives mass from c
adds +phi/m_c to diag[c]. Because west/south/bottom faces are shifted
copies of east/north/top faces (ops/fluxes.py), each such contribution can
be written in terms of c's own face fluxes — except across the tripolar
seam, where the receiver uses *its own* north flux, i.e. the i-reversed
north flux of the top row (see `_advection_north_outflux`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..grid.geometry import GridMetrics
from ..grid.topology import (
    DIRECTIONS,
    GridTopology,
    fold_i,
    neighbor_valid,
    neighbor_values,
)
from .fluxes import FaceFluxes


class StencilCoeffs(NamedTuple):
    """T as seven dense diagonals in canonical (nz, ny, nx) layout.

    `east[c]` multiplies chi at c's east neighbor, etc.; `top` is the
    k-1 (surface-ward) leg, `bottom` the k+1 leg. Units 1/s. All entries
    are exactly 0 on land and across no-neighbor boundaries.
    """

    diag: jax.Array
    east: jax.Array
    west: jax.Array
    north: jax.Array
    south: jax.Array
    top: jax.Array
    bottom: jax.Array

    def __getitem__(self, key):
        if isinstance(key, str):
            return getattr(self, key)
        return tuple.__getitem__(self, key)


def add_coeffs(*cs: StencilCoeffs) -> StencilCoeffs:
    """Sum of operators (the reference's sparse `+`, matrixbuilding.jl:147)."""
    return jax.tree_util.tree_map(lambda *xs: sum(xs), *cs)


def zeros_coeffs(shape, dtype) -> StencilCoeffs:
    z = jnp.zeros(shape, dtype)
    return StencilCoeffs(z, z, z, z, z, z, z)


def _pair_mean_rho(rho, direction, topology):
    """(rho_c + rho_neighbor)/2 per face; scalar rho passes through.

    Mirrors the reference's mean-density-of-facing-cells rule
    (matrixbuilding.jl:194,207-214).
    """
    rho = jnp.asarray(rho)
    if rho.ndim == 0:
        return rho
    return 0.5 * (rho + neighbor_values(rho, direction, topology, fill=jnp.nan))


def _safe_div(num, den):
    """num/den where num != 0, exact 0 elsewhere (avoids 0/NaN -> NaN at
    masked faces, where fluxes are exactly zero by construction)."""
    nz = num != 0
    return jnp.where(nz, num, 0.0) / jnp.where(nz, den, 1.0)


def advection_coeffs(
    phi: FaceFluxes,
    gridmetrics: GridMetrics,
    wet3d,
    rho,
    upwind: bool = True,
) -> StencilCoeffs:
    """Advection operator Tadv as stencil coefficients.

    Mirrors `advection_operator_sparse_entries` (matrixbuilding.jl:226-299):
    upwind (sign-selected) or centered (phi/2) flux divergence, with the
    surface top face skipped (evaporation/precipitation leaves tracer
    unchanged, matrixbuilding.jl:290) and per-face masses
    m = mean(rho_c, rho_nb) * v.
    """
    topo = gridmetrics.topology
    v3d = gridmetrics.v3d
    wet = jnp.asarray(wet3d, bool)
    nz = topo.nz

    k_index = jnp.arange(nz).reshape(nz, 1, 1)
    not_surface = k_index > 0

    if upwind:
        pos = lambda x: jnp.maximum(x, 0.0)
        neg = lambda x: -jnp.minimum(x, 0.0)
    else:
        pos = lambda x: x / 2
        neg = lambda x: -x / 2

    # Receiver-side influx magnitude (the phi-tilde handed to
    # pushTadvectionvalues! for each "From <dir>" branch,
    # matrixbuilding.jl:244-296).
    influx = {
        "west": pos(phi.west),
        "east": neg(phi.east),
        "south": pos(phi.south),
        "north": neg(phi.north),
        "bottom": pos(phi.bottom),
        "top": jnp.where(not_surface, neg(phi.top), 0.0),
    }

    # Donor-side outflux through each face of c (the phi-tilde of the
    # neighbor's receive branch, which adds +phi/m_c to diag[c]).
    outflux = {
        "east": pos(phi.east),
        "west": neg(phi.west),
        "south": neg(phi.south),
        "north": _advection_north_outflux(phi.north, topo, pos, neg),
        # below cell's "From Top" always has k>0, so no surface special case
        "bottom": neg(phi.bottom),
        # above cell exists only for k>0; surface top outflow is
        # evaporation and incurs no diagonal term
        "top": jnp.where(not_surface, pos(phi.top), 0.0),
    }

    coefs = {}
    diag = jnp.zeros_like(v3d)
    for d in DIRECTIONS:
        m = _pair_mean_rho(rho, d, topo) * v3d
        coefs[d] = -_safe_div(influx[d], m)
        diag = diag + _safe_div(outflux[d], m)

    mask = lambda x: jnp.where(wet, x, 0.0)
    return StencilCoeffs(
        diag=mask(diag), **{d: mask(coefs[d]) for d in DIRECTIONS}
    )


def _advection_north_outflux(phi_north, topo: GridTopology, pos, neg):
    """Donor-side phi-tilde for the north face.

    Interior rows: the j+1 neighbor receives via its "From South" branch
    using phi.south[n] == phi.north[c]  =>  pos(phi.north[c]).

    Tripolar seam (top row): the folded neighbor d receives via its own
    "From North" branch using phi.north[d] = fold_i(phi.north)[c]
    =>  neg(fold_i(phi.north))[c]. (For seam-antisymmetric transports the
    two forms agree; we mirror the reference exactly regardless.)

    Bipolar top row: phi.north is zero there (no-flux boundary), so the
    interior formula is already exact.
    """
    interior = pos(phi_north)
    if not topo.is_tripolar:
        return interior
    seam = neg(fold_i(phi_north[..., -1:, :]))
    return jnp.concatenate([interior[..., :-1, :], seam], axis=-2)


def horizontal_diffusion_coeffs(
    gridmetrics: GridMetrics,
    wet3d,
    kappa_h,
) -> StencilCoeffs:
    """Horizontal diffusion TkappaH as stencil coefficients.

    Mirrors `horizontal_diffusion_operator_sparse_entries`
    (matrixbuilding.jl:337-418): for each wet neighbor pair, interface
    area = min of the two directed vertical face areas (thickness x edge
    length), distance = centroid-to-centroid haversine, and
    Tval = kappa * a / (d * V) pushed as +diag / -offdiag
    (`pushTmixingvalues!`, matrixbuilding.jl:426-435).

    The tripolar-seam subtlety (matrixbuilding.jl:405-409): the face area
    on the far side of the seam is the folded cell's *north* face, not its
    south face.
    """
    topo = gridmetrics.topology
    v3d = gridmetrics.v3d
    thk = gridmetrics.thkcello
    wet = jnp.asarray(wet3d, bool)

    opposite_2d = {"east": "west", "west": "east", "south": "north", "north": "south"}

    diag = jnp.zeros_like(v3d)
    coefs = {}
    for d in ("east", "west", "north", "south"):
        # Own directed face area a_ij (nz, ny, nx).
        a_own = thk * gridmetrics.edge_length[d]
        # Neighbor's opposite-face area a_ji.
        a_nb_field = thk * gridmetrics.edge_length[opposite_2d[d]]
        a_nb = neighbor_values(a_nb_field, d, topo, fill=jnp.nan)
        if d == "north" and topo.is_tripolar:
            # oppdir == :north at the seam (matrixbuilding.jl:405-409)
            a_north_field = thk * gridmetrics.edge_length["north"]
            seam = fold_i(a_north_field[..., -1:, :])
            a_nb = jnp.concatenate([a_nb[..., :-1, :], seam], axis=-2)

        a = jnp.minimum(a_own, a_nb)
        dist = gridmetrics.distance_to_neighbour[d]  # (ny, nx), NaN at boundary

        nb_wet = neighbor_values(wet, d, topo, fill=False) & neighbor_valid(d, topo)
        active = wet & nb_wet

        # Double-where: NaNs (land face areas/volumes, boundary distances)
        # must be scrubbed from BOTH operands, or the VJP wrt kappa_h
        # accumulates 0 * NaN at masked cells (d tval/d kappa = a/denom
        # must be finite everywhere). Forward values unchanged: at active
        # cells numerator and denominator are untouched.
        a_clean = jnp.where(active, a, 0.0)
        denom = jnp.where(active, dist * v3d, 1.0)
        tval = kappa_h * a_clean / denom
        coefs[d] = -tval
        diag = diag + tval

    zeros = jnp.zeros_like(v3d)
    return StencilCoeffs(diag=diag, top=zeros, bottom=zeros, **coefs)


def vertical_diffusion_coeffs(
    gridmetrics: GridMetrics,
    wet3d,
    kappa_v,
    omega=None,
) -> StencilCoeffs:
    """Vertical diffusion as stencil coefficients.

    Mirrors `vertical_diffusion_operator_sparse_entries`
    (matrixbuilding.jl:438-479): for the k+-1 neighbors, a = area2D,
    d = |zt[k] - zt[k']|, Tval = kappa * a / (d * V); both cells must lie
    inside the mask `omega` (the reference's Omega). `omega=None` means the
    whole ocean (buildTkappaVdeep, matrixbuilding.jl:103-120).
    """
    topo = gridmetrics.topology
    v3d = gridmetrics.v3d
    wet = jnp.asarray(wet3d, bool)
    nz = topo.nz

    active_cell = wet if omega is None else (wet & jnp.asarray(omega, bool))

    zt = gridmetrics.zt.reshape(nz, 1, 1)
    dz_up = jnp.abs(zt - neighbor_values(zt, "top", topo, fill=jnp.nan))
    dz_dn = jnp.abs(zt - neighbor_values(zt, "bottom", topo, fill=jnp.nan))

    area = gridmetrics.area2d  # broadcasts over k

    nb_active_up = neighbor_values(active_cell, "top", topo, fill=False)
    nb_active_dn = neighbor_values(active_cell, "bottom", topo, fill=False)

    # Double-where (see horizontal_diffusion_coeffs): scrub NaN land
    # areas/volumes and boundary dz from both operands so kappa_v
    # gradients stay finite; forward values are unchanged.
    m_up = active_cell & nb_active_up
    m_dn = active_cell & nb_active_dn
    ones = jnp.ones_like(v3d)
    a_up = jnp.where(m_up, area * ones, 0.0)
    a_dn = jnp.where(m_dn, area * ones, 0.0)
    tval_up = kappa_v * a_up / jnp.where(m_up, dz_up * v3d, 1.0)
    tval_dn = kappa_v * a_dn / jnp.where(m_dn, dz_dn * v3d, 1.0)

    zeros = jnp.zeros_like(v3d)
    return StencilCoeffs(
        diag=tval_up + tval_dn,
        east=zeros,
        west=zeros,
        north=zeros,
        south=zeros,
        top=-tval_up,
        bottom=-tval_dn,
    )


def mixed_layer_mask(gridmetrics: GridMetrics, mlotst):
    """Omega mask for the mixed-layer diffusivity: zt[k] < mlotst[j,i].

    Mirrors buildTkappaVML's mask (matrixbuilding.jl:85); NaN mlotst
    (land) yields False, like the reference's `missing => false`.
    """
    nz = gridmetrics.topology.nz
    zt = gridmetrics.zt.reshape(nz, 1, 1)
    ml = jnp.asarray(mlotst)
    return jnp.where(jnp.isfinite(ml), zt < ml, False)
