"""Velocity <-> flux conversion and Arakawa grid handling.

Capability parity with the reference src/velocities.jl:1-108 (converters)
and src/gridcellgeometry.jl:1-140 (grid classification and B->C
interpolation), vectorized for TPU.
"""

from __future__ import annotations

import dataclasses
import warnings

import jax.numpy as jnp
import numpy as np

from ..grid.geometry import GridMetrics, haversine, midpoint_on_sphere
from ..grid.indices import Indices
from ..grid.topology import GridTopology, neighbor_values
from .fluxes import FaceFluxes, facefluxes


@dataclasses.dataclass(frozen=True)
class ArakawaGrid:
    """Grid staggering classification (reference's
    AGridCell/BGridCell/CGridCell, gridcellgeometry.jl:1-16)."""

    kind: str  # "A", "B", or "C"
    u_pos: str  # one of C, N, S, E, W, NE, NW, SE, SW
    v_pos: str


def getarakawagrid(u_lon, u_lat, v_lon, v_lat, gridmetrics: GridMetrics) -> ArakawaGrid:
    """Classify the staggering of (u, v) points as Arakawa A/B/C.

    Mirrors `getarakawagrid` (gridcellgeometry.jl:50-95): locate the u and
    v points of cell (0, 0) among the cell's center, edge midpoints, and
    corners by haversine distance.
    """
    lon = np.asarray(gridmetrics.lon)
    lat = np.asarray(gridmetrics.lat)
    vlon = np.asarray(gridmetrics.lon_vertices)
    vlat = np.asarray(gridmetrics.lat_vertices)

    j = i = 0
    u_point = (float(np.asarray(u_lon)[j, i]), float(np.asarray(u_lat)[j, i]))
    v_point = (float(np.asarray(v_lon)[j, i]), float(np.asarray(v_lat)[j, i]))

    corners = {
        "SW": (vlon[0, j, i], vlat[0, j, i]),
        "SE": (vlon[1, j, i], vlat[1, j, i]),
        "NE": (vlon[2, j, i], vlat[2, j, i]),
        "NW": (vlon[3, j, i], vlat[3, j, i]),
    }

    def mid(a, b):
        ml, mt = midpoint_on_sphere(
            jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(b[0]), jnp.asarray(b[1])
        )
        return (float(ml), float(mt))

    cell = {
        "C": (lon[j, i], lat[j, i]),
        **corners,
        "S": mid(corners["SW"], corners["SE"]),
        "N": mid(corners["NE"], corners["NW"]),
        "W": mid(corners["SW"], corners["NW"]),
        "E": mid(corners["SE"], corners["NE"]),
    }

    def dist(p, q):
        return float(haversine(p[0], p[1], q[0], q[1]))

    u_pos, u_dist = min(
        ((k, dist(p, u_point)) for k, p in cell.items()), key=lambda kv: kv[1]
    )
    v_pos, v_dist = min(
        ((k, dist(p, v_point)) for k, p in cell.items()), key=lambda kv: kv[1]
    )

    if u_pos == v_pos == "C":
        kind = "A"
    elif u_pos == v_pos and u_pos in ("NE", "NW", "SE", "SW"):
        kind = "B"
    elif u_pos in ("E", "W") and v_pos in ("N", "S"):
        kind = "C"
    else:
        raise ValueError(f"Unknown Arakawa grid type (u at {u_pos}, v at {v_pos})")

    perimeter = (
        dist(corners["SW"], corners["SE"])
        + dist(corners["SE"], corners["NE"])
        + dist(corners["NE"], corners["NW"])
        + dist(corners["NW"], corners["SW"])
    )
    relerr = (u_dist + v_dist) / perimeter
    if relerr > 0.01:
        warnings.warn(
            f"Relative error in grid positions of {kind}-grid is {relerr:.3g}"
        )
    return ArakawaGrid(kind=kind, u_pos=u_pos, v_pos=v_pos)


def interpolateontodefaultCgrid(
    u, u_lon, u_lat, v, v_lon, v_lat, gridmetrics: GridMetrics,
    arakawa: ArakawaGrid | None = None, fill_value: float | None = None,
):
    """Interpolate (u, v) onto the default C-grid (east/north faces).

    Mirrors `interpolateontodefaultCgrid` (gridcellgeometry.jl:103-140):
    C-grid is the identity; B-grid(NE) averages the two corner velocities
    along the face (with zero-padded boundaries, FillValue/NaN -> 0
    first); A-grid is unsupported, as in the reference.

    Returns (u, u_lon, u_lat, v, v_lon, v_lat) on the C-grid.
    """
    if arakawa is None:
        arakawa = getarakawagrid(u_lon, u_lat, v_lon, v_lat, gridmetrics)
    if arakawa.kind == "C":
        return u, u_lon, u_lat, v, v_lon, v_lat
    if arakawa.kind == "A":
        raise NotImplementedError("Interpolation not implemented for A-grid type")
    if not (arakawa.u_pos == arakawa.v_pos == "NE"):
        raise NotImplementedError(
            f"Interpolation not implemented for this B-grid"
            f"({arakawa.u_pos},{arakawa.v_pos}) type"
        )

    u = jnp.asarray(u)
    v = jnp.asarray(v)

    def clean(x):
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        if fill_value is not None:
            x = jnp.where(x == fill_value, 0.0, x)
        return x

    u2 = clean(u)
    v2 = clean(v)
    # B(NE) -> C: average the NE-corner velocity with the one at j-1 for u
    # (east face midpoint) and at i-1 for v (north face midpoint), zero at
    # the open boundary (gridcellgeometry.jl:127-128).
    u2 = 0.5 * (
        u2
        + jnp.concatenate([jnp.zeros_like(u2[..., :1, :]), u2[..., :-1, :]], axis=-2)
    )
    v2 = 0.5 * (
        v2
        + jnp.concatenate([jnp.zeros_like(v2[..., :, :1]), v2[..., :, :-1]], axis=-1)
    )

    vlon = gridmetrics.lon_vertices
    vlat = gridmetrics.lat_vertices
    u2_lon, u2_lat = midpoint_on_sphere(vlon[1], vlat[1], vlon[2], vlat[2])  # SE-NE
    v2_lon, v2_lat = midpoint_on_sphere(vlon[2], vlat[2], vlon[3], vlat[3])  # NE-NW
    return u2, u2_lon, u2_lat, v2, v2_lon, v2_lat


def _two_cell_nanmean(x, direction, topology):
    """NaN-aware mean of a cell and its `direction`-neighbor
    (reference twocellnanmean/nanmean2, velocities.jl:77-93)."""
    x = jnp.asarray(x)
    if x.ndim == 0:
        return x
    nb = neighbor_values(x, direction, topology, fill=jnp.nan)
    wa = jnp.isfinite(x)
    wb = jnp.isfinite(nb)
    num = jnp.where(wa, x, 0.0) + jnp.where(wb, nb, 0.0)
    den = wa.astype(x.dtype) + wb.astype(x.dtype)
    return num / den  # NaN (0/0) when both missing, as in the reference


def _two_cell_nanmin(x, direction, topology):
    """NaN-aware min of a cell and its `direction`-neighbor
    (reference twocellnanmin/nanmin2, velocities.jl:96-108)."""
    x = jnp.asarray(x)
    if x.ndim == 0:
        return x
    nb = neighbor_values(x, direction, topology, fill=jnp.nan)
    return jnp.where(
        jnp.isnan(x), nb, jnp.where(jnp.isnan(nb), x, jnp.minimum(x, nb))
    )


def velocity2fluxes(u, u_lon, u_lat, v, v_lon, v_lat, gridmetrics: GridMetrics, rho,
                    fill_value: float | None = None,
                    arakawa_kind: str | None = None):
    """Mass fluxes (kg/s) through east/north faces from C- or B-grid
    velocities (m/s).

    Mirrors `velocity2fluxes` (velocities.jl:10-39): B->C interpolation if
    needed, then phi = u * mean-rho(two cells) * min-thickness(two cells)
    * edge length, with the pair taken along the face direction.

    Pass `arakawa_kind="C"` to skip classification when the velocities are
    already on the default C-grid faces (u_lon etc. may then be None).
    """
    topo = gridmetrics.topology
    if arakawa_kind == "C":
        pass  # already on the default C-grid
    else:
        u, _, _, v, _, _ = interpolateontodefaultCgrid(
            u, u_lon, u_lat, v, v_lon, v_lat, gridmetrics, fill_value=fill_value
        )
    thk = gridmetrics.thkcello
    phi_i = (
        jnp.asarray(u)
        * _two_cell_nanmean(jnp.asarray(rho), "east", topo)
        * _two_cell_nanmin(thk, "east", topo)
        * gridmetrics.edge_length["east"]
    )
    phi_j = (
        jnp.asarray(v)
        * _two_cell_nanmean(jnp.asarray(rho), "north", topo)
        * _two_cell_nanmin(thk, "north", topo)
        * gridmetrics.edge_length["north"]
    )
    return phi_i, phi_j


def fluxes2velocity(phi_i, phi_j, gridmetrics: GridMetrics, rho):
    """Inverse of `velocity2fluxes` (reference velocities.jl:50-74)."""
    topo = gridmetrics.topology
    thk = gridmetrics.thkcello
    u = jnp.asarray(phi_i) / (
        _two_cell_nanmean(jnp.asarray(rho), "east", topo)
        * _two_cell_nanmin(thk, "east", topo)
        * gridmetrics.edge_length["east"]
    )
    v = jnp.asarray(phi_j) / (
        _two_cell_nanmean(jnp.asarray(rho), "north", topo)
        * _two_cell_nanmin(thk, "north", topo)
        * gridmetrics.edge_length["north"]
    )
    return u, v


def facefluxesfromvelocities(
    *,
    uo,
    uo_lon,
    uo_lat,
    vo,
    vo_lon,
    vo_lat,
    gridmetrics: GridMetrics,
    indices: Indices,
    rho,
    fill_value: float | None = None,
) -> FaceFluxes:
    """Six-face fluxes from velocities (reference
    `facefluxesfromvelocities`, velocities.jl:140-151)."""
    dtype = gridmetrics.v3d.dtype
    umo, vmo = velocity2fluxes(
        jnp.asarray(uo, dtype), uo_lon, uo_lat, jnp.asarray(vo, dtype),
        vo_lon, vo_lat, gridmetrics, rho, fill_value=fill_value,
    )
    return facefluxes(
        umo, vmo, indices.wet3d, gridmetrics.topology, fill_value=fill_value
    )
