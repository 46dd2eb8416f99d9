"""Derivative kernels: classic forward/backward, dyads, and triads.

Capability parity with the reference src/classicderivatives.jl,
src/dyads.jl, and src/triads.jl, vectorized over the whole grid. The
reference encodes "no neighbor" as NaN via `getindexornan` and relies on
Julia's strong-zero `false * NaN == 0` in its NaN-weighted means; here the
same semantics use explicit `where` masks.

Direction names: `"i"` (zonal, east/west) and `"j"` (meridional,
north/south), matching the reference's Icoord/Jcoord tags.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..grid.geometry import GridMetrics
from ..grid.topology import neighbor_values

_FORWARD_DIR = {"i": "east", "j": "north"}
_BACKWARD_DIR = {"i": "west", "j": "south"}


def _nanaware_mean(deltas):
    """Mean of the finite entries; NaN if none (reference's weighted sums,
    dyads.jl:58-65 / triads.jl:114-133)."""
    num = 0.0
    den = 0.0
    for d in deltas:
        ok = jnp.isfinite(d)
        num = num + jnp.where(ok, d, 0.0)
        den = den + ok.astype(d.dtype if hasattr(d, "dtype") else jnp.float32)
    return num / den


# --- classic forward/backward derivatives (classicderivatives.jl) ---------


def horizontal_derivative_forward(chi, gridmetrics: GridMetrics, direction: str):
    """Forward horizontal derivative along `direction` in {"i", "j"}:
    (chi[next] - chi[c]) / haversine distance (classicderivatives.jl:11-15).
    NaN where the neighbor does not exist."""
    topo = gridmetrics.topology
    d = _FORWARD_DIR[direction]
    nb = neighbor_values(jnp.asarray(chi), d, topo, fill=jnp.nan)
    dist = gridmetrics.distance_to_neighbour[d]
    return (nb - chi) / dist


def horizontal_derivative_backward(chi, gridmetrics: GridMetrics, direction: str):
    """Backward horizontal derivative (classicderivatives.jl:16-20)."""
    topo = gridmetrics.topology
    d = _BACKWARD_DIR[direction]
    nb = neighbor_values(jnp.asarray(chi), d, topo, fill=jnp.nan)
    dist = gridmetrics.distance_to_neighbour[d]
    return (chi - nb) / dist


def vertical_derivative_forward(chi, gridmetrics: GridMetrics):
    """Forward (downward, k+1) vertical derivative using cell-center depths
    Z3D (classicderivatives.jl:27-31)."""
    topo = gridmetrics.topology
    nb = neighbor_values(jnp.asarray(chi), "bottom", topo, fill=jnp.nan)
    z_nb = neighbor_values(gridmetrics.z3d, "bottom", topo, fill=jnp.nan)
    return (nb - chi) / jnp.abs(z_nb - gridmetrics.z3d)


def vertical_derivative_backward(chi, gridmetrics: GridMetrics):
    """Backward (upward, k-1) vertical derivative (classicderivatives.jl:32-36)."""
    topo = gridmetrics.topology
    nb = neighbor_values(jnp.asarray(chi), "top", topo, fill=jnp.nan)
    z_nb = neighbor_values(gridmetrics.z3d, "top", topo, fill=jnp.nan)
    return (chi - nb) / jnp.abs(z_nb - gridmetrics.z3d)


# --- vertical dyads (dyads.jl) --------------------------------------------


def vertical_dyad_derivative(chi, gridmetrics: GridMetrics, wet3d=None):
    """NaN-weighted average of the upward and downward vertical derivatives.

    Mirrors `globalverticaldyadderivative` (dyads.jl:66-78): the dyad
    "N" is k-1 (above) and "S" is k+1 (below); the result is the mean of
    the finite one-sided slopes, NaN where the input field is masked.
    """
    chi = jnp.asarray(chi)
    topo = gridmetrics.topology
    z = gridmetrics.z3d

    chi_up = neighbor_values(chi, "top", topo, fill=jnp.nan)
    chi_dn = neighbor_values(chi, "bottom", topo, fill=jnp.nan)
    dz_up = jnp.abs(neighbor_values(z, "top", topo, fill=jnp.nan) - z)
    dz_dn = jnp.abs(neighbor_values(z, "bottom", topo, fill=jnp.nan) - z)

    out = _nanaware_mean([(chi_up - chi) / dz_up, (chi - chi_dn) / dz_dn])
    if wet3d is not None:
        out = jnp.where(jnp.asarray(wet3d, bool), out, jnp.nan)
    return out


# --- triads (triads.jl) ---------------------------------------------------


def centered_triad_derivative(chi, gridmetrics: GridMetrics, direction: str,
                              wet3d=None):
    """NaN-weighted mean of the 4 one-sided slopes of the centered triad
    group (E, W horizontal and N=k-1, S=k+1 vertical), mirroring
    `localtriadderivative(::CenteredTriadGroupValues)` (triads.jl:57-66).
    """
    chi = jnp.asarray(chi)
    topo = gridmetrics.topology
    z = gridmetrics.z3d

    fwd = _FORWARD_DIR[direction]
    bwd = _BACKWARD_DIR[direction]
    chi_e = neighbor_values(chi, fwd, topo, fill=jnp.nan)
    chi_w = neighbor_values(chi, bwd, topo, fill=jnp.nan)
    d_e = gridmetrics.distance_to_neighbour[fwd]
    d_w = gridmetrics.distance_to_neighbour[bwd]

    chi_n = neighbor_values(chi, "top", topo, fill=jnp.nan)
    chi_s = neighbor_values(chi, "bottom", topo, fill=jnp.nan)
    dz_n = jnp.abs(neighbor_values(z, "top", topo, fill=jnp.nan) - z)
    dz_s = jnp.abs(neighbor_values(z, "bottom", topo, fill=jnp.nan) - z)

    out = _nanaware_mean(
        [
            (chi_e - chi) / d_e,
            (chi - chi_w) / d_w,
            (chi_n - chi) / dz_n,
            (chi - chi_s) / dz_s,
        ]
    )
    if wet3d is not None:
        out = jnp.where(jnp.asarray(wet3d, bool), out, jnp.nan)
    return out


def vertical_face_triad_group_distances(gridmetrics: GridMetrics,
                                        direction: str):
    """Geometric distances of the POP-style 6-point vertical-face triad
    group, one (nz, ny, nx) array per leg, as seen from every center cell
    (reference `verticalfacetriadgroupdistances`, triads.jl:103-112):

        CN  = |Z[N]  - Z[C]|    (N is k-1, above)
        CS  = |Z[C]  - Z[S]|    (S is k+1, below)
        CE  = haversine center-to-neighbor distance in `direction`
        ENE = |Z[NE] - Z[E]|    (the E column's upward leg)
        ESE = |Z[E]  - Z[SE]|
    """
    topo = gridmetrics.topology
    z = gridmetrics.z3d
    fwd = _FORWARD_DIR[direction]
    dz_up = jnp.abs(neighbor_values(z, "top", topo, fill=jnp.nan) - z)
    dz_dn = jnp.abs(neighbor_values(z, "bottom", topo, fill=jnp.nan) - z)
    return {
        "CN": dz_up,
        "CS": dz_dn,
        "CE": gridmetrics.distance_to_neighbour[fwd],
        "ENE": neighbor_values(dz_up, fwd, topo, fill=jnp.nan),
        "ESE": neighbor_values(dz_dn, fwd, topo, fill=jnp.nan),
    }


def vertical_face_triad_derivative_group(vals, gridmetrics: GridMetrics,
                                         direction: str, wet3d=None):
    """Triad slope from explicit per-center group values.

    `vals` maps the 6 group tags {"C","N","S","E","NE","SE"} to
    (nz, ny, nx) arrays giving that member's value as seen FROM each
    center cell. This is the array-level form of the reference's
    `localtriadderivative(::VerticalFaceTriadGroupValues)`
    (triads.jl:114-133) for fields that are not a single global array —
    e.g. potential density referenced to the center cell's depth, where
    every center sees a different density at the same neighbor.
    """
    d = vertical_face_triad_group_distances(gridmetrics, direction)
    d_cn = (vals["N"] - vals["C"]) / d["CN"]
    d_cs = (vals["C"] - vals["S"]) / d["CS"]
    d_ce = (vals["E"] - vals["C"]) / d["CE"]
    d_ene = (vals["NE"] - vals["E"]) / d["ENE"]
    d_ese = (vals["E"] - vals["SE"]) / d["ESE"]

    out = _nanaware_mean([d_ce / d_cn, d_ce / d_cs, d_ce / d_ene, d_ce / d_ese])
    if wet3d is not None:
        out = jnp.where(jnp.asarray(wet3d, bool), out, jnp.nan)
    return out


def vertical_face_triad_group_values(chi, gridmetrics: GridMetrics,
                                     direction: str):
    """The 6 group-member fields of a single global array `chi` (reference
    `verticalfacetriadgroupvalues`, triads.jl:90-102): per center cell,
    the values at C, N(k-1), S(k+1), E(`direction` neighbor), NE, SE."""
    chi = jnp.asarray(chi)
    topo = gridmetrics.topology
    fwd = _FORWARD_DIR[direction]

    def at(arr, *dirs):
        for dd in dirs:
            arr = neighbor_values(arr, dd, topo, fill=jnp.nan)
        return arr

    return {
        "C": chi,
        "N": at(chi, "top"),
        "S": at(chi, "bottom"),
        "E": at(chi, fwd),
        "NE": at(chi, fwd, "top"),
        "SE": at(chi, fwd, "bottom"),
    }


def vertical_face_triad_derivative(chi, gridmetrics: GridMetrics, direction: str,
                                   wet3d=None):
    """Isoneutral slope estimate on the vertical face in `direction`.

    Mirrors `globalverticalfacetriadderivative` (triads.jl:134-146): the
    POP-style 6-point group (C, N, S, E, NE, SE) yields four
    dE/dN slope-ratio combinations

        (CE/CN, CE/CS, CE/ENE, CE/ESE)

    whose NaN-weighted mean is returned (triads.jl:114-133). NaN outside
    `wet3d` if given.
    """
    chi = jnp.asarray(chi)
    topo = gridmetrics.topology
    z = gridmetrics.z3d
    fwd = _FORWARD_DIR[direction]

    # Local one-sided vertical slopes at every cell.
    chi_up = neighbor_values(chi, "top", topo, fill=jnp.nan)
    chi_dn = neighbor_values(chi, "bottom", topo, fill=jnp.nan)
    dz_up = jnp.abs(neighbor_values(z, "top", topo, fill=jnp.nan) - z)
    dz_dn = jnp.abs(neighbor_values(z, "bottom", topo, fill=jnp.nan) - z)
    d_cn = (chi_up - chi) / dz_up  # Delta CN
    d_cs = (chi - chi_dn) / dz_dn  # Delta CS

    # Horizontal slope to the E neighbor.
    chi_e = neighbor_values(chi, fwd, topo, fill=jnp.nan)
    d_ce = (chi_e - chi) / gridmetrics.distance_to_neighbour[fwd]

    # The E-column vertical slopes are the local ones shifted to E.
    d_ene = neighbor_values(d_cn, fwd, topo, fill=jnp.nan)
    d_ese = neighbor_values(d_cs, fwd, topo, fill=jnp.nan)

    out = _nanaware_mean([d_ce / d_cn, d_ce / d_cs, d_ce / d_ene, d_ce / d_ese])
    if wet3d is not None:
        out = jnp.where(jnp.asarray(wet3d, bool), out, jnp.nan)
    return out
