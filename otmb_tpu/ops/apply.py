"""Matrix-free application of the stencil operator.

`apply_stencil` is the jnp reference path (XLA fuses the seven
multiply-adds and the topology gathers into a few memory-bound passes);
`ops/stencil_pallas.py` provides the hand-fused Pallas kernel used on the
hot path. Both compute

    y[c] = diag[c] * x[c] + sum_d coef[d][c] * x[neighbor_d(c)]

which is the action of the reference's sparse T (matrixbuilding.jl) on a
wet-masked tracer field, with land cells carrying exact zeros.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..grid.topology import DIRECTIONS, GridTopology, neighbor_values, scatter_to_neighbor
from .coeffs import StencilCoeffs


def apply_stencil(coeffs: StencilCoeffs, chi, topology: GridTopology):
    """y = T @ chi on dense (nz, ny, nx) fields.

    `chi` must be zero (or at least finite) on land; land outputs are
    exact zeros because all land coefficients are zero.
    """
    chi = jnp.asarray(chi)
    acc = coeffs.diag * chi
    for d in DIRECTIONS:
        acc = acc + coeffs[d] * neighbor_values(chi, d, topology, fill=0.0)
    return acc


def apply_stencil_transpose(coeffs: StencilCoeffs, chi, topology: GridTopology):
    """y = T' @ chi (needed e.g. for the volume-conservation diagnostic
    ||v|| / ||T' v||, reference test/online.jl:114-117).

    T'[c, j] = T[j, c], so each leg scatters instead of gathers:
    (T' x)[c] = diag[c] x[c] + sum_d sum_{j : nb_d(j) = c} coef_d[j] x[j].
    """
    chi = jnp.asarray(chi)
    acc = coeffs.diag * chi
    for d in DIRECTIONS:
        acc = acc + scatter_to_neighbor(coeffs[d] * chi, d, topology)
    return acc


def transpose_coeffs(coeffs: StencilCoeffs, topology: GridTopology) -> StencilCoeffs:
    """The stencil representation of T', so the *forward* apply machinery
    (including the fused Pallas kernel) can run adjoint problems:

        apply_stencil(transpose_coeffs(c), x) == apply_stencil_transpose(c, x)

    T'[c, j] = T[j, c]: the coefficient multiplying x[nb_d(c)] in T' is the
    coefficient with which nb_d(c) points back at c in T, i.e. the
    *opposite* leg gathered from the d-neighbor (east'<-west, top'<-bottom,
    ...). The one non-paired case is the tripolar seam: the fold is its own
    inverse, so a top-row cell is pointed at by its fold partner's NORTH
    leg (not south), and the north' top row gathers coeffs.north across the
    fold (reference fold semantics: gridtopology.jl:94-95). Cost: seven
    gathers, one-time per solve — negligible against Krylov iterations.
    """
    nv = lambda a, d: neighbor_values(a, d, topology, fill=0.0)
    north = nv(coeffs.south, "north")
    if topology.is_tripolar:
        fold_north = nv(coeffs.north, "north")
        north = north.at[:, -1, :].set(fold_north[:, -1, :])
    return StencilCoeffs(
        diag=coeffs.diag,
        east=nv(coeffs.west, "east"),
        west=nv(coeffs.east, "west"),
        north=north,
        south=nv(coeffs.north, "south"),
        top=nv(coeffs.bottom, "top"),
        bottom=nv(coeffs.top, "bottom"),
    )


def operator_diagnostics(coeffs: StencilCoeffs, v3d, wet3d, topology: GridTopology):
    """Divergence / volume-conservation timescales (seconds).

    Ports the de-facto spec from the reference tests (test/online.jl:106-117):
      tau_div = ||1|| / ||T 1||     (row sums ~ 0 for diffusive operators)
      tau_vol = ||v|| / ||T' v||    (volume-weighted column sums ~ 0)
    computed over wet cells with 2-norms.
    """
    wet = jnp.asarray(wet3d, bool)
    nwet = jnp.sum(wet)

    ones = jnp.where(wet, 1.0, 0.0).astype(coeffs.diag.dtype)
    t_ones = apply_stencil(coeffs, ones, topology)
    tau_div = jnp.sqrt(nwet) / jnp.linalg.norm(jnp.where(wet, t_ones, 0.0))

    v = jnp.where(wet, v3d, 0.0)
    tt_v = apply_stencil_transpose(coeffs, v, topology)
    tau_vol = jnp.linalg.norm(v) / jnp.linalg.norm(jnp.where(wet, tt_v, 0.0))

    return {"tau_div_s": tau_div, "tau_vol_s": tau_vol}
