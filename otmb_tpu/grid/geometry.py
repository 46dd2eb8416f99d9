"""Grid-cell geometry: vectorized haversine metrics and `makegridmetrics`.

Capability parity with the reference src/gridcellgeometry.jl, re-designed
array-first: where the reference computes per-cell haversines in Julia
loops (gridcellgeometry.jl:304-308), we evaluate whole-(ny,nx) trig
expressions that XLA fuses into a handful of VPU passes.

Canonical layout (see grid/topology.py): 2D fields are (ny, nx), 3D fields
(nz, ny, nx), vertex fields (4, ny, nx) with vertices ordered
SW, SE, NE, NW (reference "default orientation", gridcellgeometry.jl:149-156).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EARTH_RADIUS
from . import topology as topo_mod
from .topology import DIRECTIONS, GridTopology, detect_topology, neighbor_values

# Vertex indices delimiting each directed cell edge, 0-based
# (reference `vertexindices`, gridcellgeometry.jl:209-215).
EDGE_VERTICES = {
    "south": (0, 1),
    "east": (1, 2),
    "north": (2, 3),
    "west": (0, 3),
}


def cell_thickness_from_lev_bnds(lev_bnds, ny: int, nx: int):
    """Cell thickness from level bounds (2, nz) or (nz, 2), broadcast to
    (nz, ny, nx) — the reference's `cellthickness(lev_bnds::Matrix, ...)`
    dispatch (gridcellgeometry.jl:236), for datasets without volcello-
    derived thickness."""
    lev_bnds = jnp.asarray(lev_bnds)
    if lev_bnds.ndim != 2 or 2 not in lev_bnds.shape:
        raise ValueError(f"lev_bnds must be (2, nz) or (nz, 2), got {lev_bnds.shape}")
    if lev_bnds.shape[0] != 2:
        lev_bnds = lev_bnds.T
    thick = jnp.abs(lev_bnds[1] - lev_bnds[0])  # (nz,)
    return jnp.broadcast_to(thick[:, None, None], (thick.shape[0], ny, nx))


def haversine(lon1, lat1, lon2, lat2, radius: float = EARTH_RADIUS):
    """Great-circle distance (m) between (lon, lat) points in degrees.

    Matches Distances.jl's `haversine` used throughout the reference.
    Fully vectorized; NaN inputs propagate to NaN outputs.
    """
    lon1, lat1, lon2, lat2 = (jnp.asarray(x) for x in (lon1, lat1, lon2, lat2))
    phi1 = jnp.deg2rad(lat1)
    phi2 = jnp.deg2rad(lat2)
    dphi = phi2 - phi1
    dlam = jnp.deg2rad(lon2 - lon1)
    a = jnp.sin(dphi / 2) ** 2 + jnp.cos(phi1) * jnp.cos(phi2) * jnp.sin(dlam / 2) ** 2
    # clip guards tiny negative/overshoot from rounding
    return 2 * radius * jnp.arcsin(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))


def midpoint_on_sphere(lon_a, lat_a, lon_b, lat_b):
    """Midpoint of an edge, antimeridian-aware.

    Mirrors `midpointonsphere` (gridcellgeometry.jl:249-255): plain average
    unless the edge crosses the map's longitudinal edge, in which case the
    longitude is shifted by 180.
    """
    crosses = jnp.abs(lon_a - lon_b) >= 180.0
    mid_lon = (lon_a + lon_b) / 2 + jnp.where(crosses, 180.0, 0.0)
    mid_lat = (lat_a + lat_b) / 2
    return mid_lon, mid_lat


def vertex_permutation(lon_vertices: np.ndarray, lat_vertices: np.ndarray) -> list[int]:
    """Permutation putting the 4 cell vertices into SW, SE, NE, NW order.

    Host-side re-derivation of `vertexpermutation`
    (gridcellgeometry.jl:158-178): intersect the vertex sets of cell (0,0)
    with its east (1,0) and north (0,1) neighbors to identify which corner
    is which. Input is (4, ny, nx).
    """
    lon_vertices = np.asarray(lon_vertices)
    lat_vertices = np.asarray(lat_vertices)
    assert lon_vertices.shape[0] == lat_vertices.shape[0] == 4

    def cell_points(j, i):
        return [
            (float(lon_vertices[v, j, i]), float(lat_vertices[v, j, i]))
            for v in range(4)
        ]

    points = cell_points(0, 0)
    points_east = set(cell_points(0, 1))
    points_north = set(cell_points(1, 0))

    idx_east = {v for v, p in enumerate(points) if p in points_east}
    idx_north = {v for v, p in enumerate(points) if p in points_north}
    (idx3,) = idx_east & idx_north  # shared with both east and north cells => NE
    (idx2,) = idx_east - {idx3}  # shared with east only => SE
    (idx4,) = idx_north - {idx3}  # shared with north only => NW
    (idx1,) = set(range(4)) - {idx2, idx3, idx4}  # unique to this cell => SW
    return [idx1, idx2, idx3, idx4]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PerDirection:
    """A value per horizontal direction (the reference's per-dir Dicts)."""

    east: Any
    west: Any
    north: Any
    south: Any

    def __getitem__(self, direction: str):
        return getattr(self, direction)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridMetrics:
    """All grid geometry, the analog of the reference `gridmetrics` tuple
    (gridcellgeometry.jl:310).

    Fields are JAX arrays in canonical layout; `topology` is static
    metadata so `GridMetrics` can flow through jit/pjit unhindered.
    """

    area2d: jax.Array  # (ny, nx) horizontal cell area, m^2
    v3d: jax.Array  # (nz, ny, nx) cell volume, m^3, NaN on land
    thkcello: jax.Array  # (nz, ny, nx) cell thickness, m
    lon: jax.Array  # (ny, nx) cell-center longitude, deg
    lat: jax.Array  # (ny, nx) cell-center latitude, deg
    lon_vertices: jax.Array  # (4, ny, nx) SW,SE,NE,NW
    lat_vertices: jax.Array  # (4, ny, nx)
    z3d: jax.Array  # (nz, ny, nx) cell-center depth, m
    zt: jax.Array  # (nz,) nominal level depth, m
    edge_length: PerDirection  # (ny, nx) per direction, m
    distance_to_edge: PerDirection  # (ny, nx) per direction, m
    distance_to_neighbour: PerDirection  # (ny, nx) per direction, m (NaN at no-neighbor)
    topology: GridTopology = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self) -> tuple[int, int, int]:
        return self.topology.shape3d


def _nanify(x, fill_value) -> np.ndarray:
    """Replace fill values / masked / zero entries with NaN.

    Mirrors the reference's canonicalization (gridcellgeometry.jl:269-280),
    which replaces `missing`, `nothing`, `0`, and `_FillValue` with NaN.
    """
    x = np.ma.filled(np.ma.masked_invalid(np.asarray(x, dtype=np.float64)), np.nan)
    x = np.where(x == 0.0, np.nan, x)
    if fill_value is not None:
        x = np.where(x == fill_value, np.nan, x)
    return x


def edge_lengths(lon_vertices, lat_vertices) -> PerDirection:
    """Haversine length of each cell edge per direction (m).

    Vectorized `verticalfacewidth` (gridcellgeometry.jl:217-222).
    """
    out = {}
    for d, (a, b) in EDGE_VERTICES.items():
        out[d] = haversine(
            lon_vertices[a], lat_vertices[a], lon_vertices[b], lat_vertices[b]
        )
    return PerDirection(**out)


def distances_to_edge(lon, lat, lon_vertices, lat_vertices) -> PerDirection:
    """Haversine distance from cell center to each edge midpoint (m).

    Vectorized `centroid2edgedistance` (gridcellgeometry.jl:240-247).
    """
    out = {}
    for d, (a, b) in EDGE_VERTICES.items():
        mid_lon, mid_lat = midpoint_on_sphere(
            lon_vertices[a], lat_vertices[a], lon_vertices[b], lat_vertices[b]
        )
        out[d] = haversine(lon, lat, mid_lon, mid_lat)
    return PerDirection(**out)


def distances_to_neighbour(lon, lat, topology: GridTopology) -> PerDirection:
    """Haversine distance from each cell center to its neighbor's center.

    Vectorized `horizontaldistance` over the topology's neighbor map
    (gridcellgeometry.jl:182-189 + gridcellgeometry.jl:308). NaN where the
    neighbor does not exist (reference `horizontaldistance(..., ::Nothing)
    = NaN`).
    """
    out = {}
    for d in ("east", "west", "north", "south"):
        nlon = neighbor_values(lon, d, topology, fill=jnp.nan)
        nlat = neighbor_values(lat, d, topology, fill=jnp.nan)
        out[d] = haversine(lon, lat, nlon, nlat)
    return PerDirection(**out)


def makegridmetrics(
    *,
    areacello,
    volcello,
    lon,
    lat,
    lev,
    lon_vertices,
    lat_vertices,
    fill_value: float | None = None,
    dtype=None,
) -> GridMetrics:
    """Build all grid metrics from raw CMIP-style fields.

    TPU-native counterpart of the reference `makegridmetrics`
    (gridcellgeometry.jl:265-311). Inputs are in canonical numpy order:
    `areacello` (ny, nx), `volcello` (nz, ny, nx), `lon`/`lat` (ny, nx),
    `lev` (nz,), vertices (4, ny, nx) in any vertex order (they are
    canonicalized to SW, SE, NE, NW here).

    `fill_value` is the dataset `_FillValue` if any; zeros, non-finite and
    masked entries are replaced by NaN regardless, as in the reference.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if not jnp.issubdtype(jnp.asarray([], dtype).dtype, jnp.floating):
        raise ValueError("dtype must be a floating dtype")

    v3d = _nanify(volcello, fill_value)
    area2d = _nanify(areacello, fill_value)
    if v3d.ndim != 3:
        raise ValueError(f"volcello must be (nz, ny, nx), got shape {v3d.shape}")
    nz, ny, nx = v3d.shape
    if area2d.shape != (ny, nx):
        raise ValueError(
            f"areacello shape {area2d.shape} does not match volcello {(ny, nx)}"
        )

    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zt = np.asarray(lev, dtype=np.float64).reshape(-1)
    lon_vertices = np.asarray(lon_vertices, dtype=np.float64)
    lat_vertices = np.asarray(lat_vertices, dtype=np.float64)
    if lon_vertices.shape != (4, ny, nx):
        raise ValueError(
            f"lon_vertices must be (4, ny, nx)={(4, ny, nx)}, got {lon_vertices.shape}"
        )

    # Canonicalize vertex order (reference gridcellgeometry.jl:296-298).
    perm = vertex_permutation(lon_vertices, lat_vertices)
    lon_vertices = lon_vertices[perm]
    lat_vertices = lat_vertices[perm]

    # Thickness and depth (reference gridcellgeometry.jl:283-285).
    thkcello = v3d / area2d  # broadcasting over k
    zbot3d = np.cumsum(thkcello, axis=0)
    z3d = zbot3d - 0.5 * thkcello

    topology = detect_topology(lon_vertices, lat_vertices, nz)

    lon_j = jnp.asarray(lon, dtype)
    lat_j = jnp.asarray(lat, dtype)
    vlon_j = jnp.asarray(lon_vertices, dtype)
    vlat_j = jnp.asarray(lat_vertices, dtype)

    return GridMetrics(
        area2d=jnp.asarray(area2d, dtype),
        v3d=jnp.asarray(v3d, dtype),
        thkcello=jnp.asarray(thkcello, dtype),
        lon=lon_j,
        lat=lat_j,
        lon_vertices=vlon_j,
        lat_vertices=vlat_j,
        z3d=jnp.asarray(z3d, dtype),
        zt=jnp.asarray(zt, dtype),
        edge_length=edge_lengths(vlon_j, vlat_j),
        distance_to_edge=distances_to_edge(lon_j, lat_j, vlon_j, vlat_j),
        distance_to_neighbour=distances_to_neighbour(lon_j, lat_j, topology),
        topology=topology,
    )
