"""Grid topology: seam detection and array-level neighbor semantics.

The reference (src/gridtopology.jl) encodes topology as per-cell index
functions (i₊₁, j₊₁, ...) returning a CartesianIndex or `nothing`. On TPU
we instead express neighbor access as whole-array shift operations so the
compiler sees static-shape, fusable gathers:

  * i (longitude) is periodic: `jnp.roll`.
  * j (latitude): no connection at j=0; at j=ny-1 either no connection
    (bipolar) or the tripolar fold  (i, ny-1) -> (nx-1-i, ny-1)
    (reference gridtopology.jl:94-95, 1-based (i,ny) -> (nx-i+1, ny)).
  * k (depth): no connection at either end.

Neighbor access returns the neighbor's value with a caller-chosen fill at
disconnected boundaries; `neighbor_valid` gives the connectivity mask.

Canonical array layout is [..., k, j, i] == (nz, ny, nx) for 3D fields and
(ny, nx) for 2D fields — i (longitude) innermost so it lands on TPU lanes.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax.numpy as jnp
import numpy as np

Direction = Literal["east", "west", "north", "south", "top", "bottom"]

#: The six face/neighbor directions, in the order used for stencil stacks.
DIRECTIONS: tuple[Direction, ...] = ("east", "west", "north", "south", "top", "bottom")
HORIZONTAL_DIRECTIONS: tuple[Direction, ...] = ("east", "west", "north", "south")

OPPOSITE = {
    "east": "west",
    "west": "east",
    "north": "south",
    "south": "north",
    "top": "bottom",
    "bottom": "top",
}

BIPOLAR = "bipolar"
TRIPOLAR = "tripolar"
UNKNOWN = "unknown"


@dataclasses.dataclass(frozen=True)
class GridTopology:
    """Static (hashable) grid topology descriptor.

    Mirrors the reference's Bipolar/Tripolar/UnknownGridTopology structs
    (gridtopology.jl:2-16). Being frozen/hashable it can be closed over by
    jitted functions without becoming a traced value.
    """

    kind: str
    nx: int
    ny: int
    nz: int

    @property
    def is_tripolar(self) -> bool:
        return self.kind == TRIPOLAR

    @property
    def shape2d(self) -> tuple[int, int]:
        return (self.ny, self.nx)

    @property
    def shape3d(self) -> tuple[int, int, int]:
        return (self.nz, self.ny, self.nx)


def _wrap_lon_delta(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Longitude difference wrapped to (-180, 180]."""
    return np.mod(a - b + 180.0, 360.0) - 180.0


def isapprox_lon(a, b, atol: float | None = None) -> bool:
    """Periodic-aware approximate longitude equality (gridtopology.jl:23-26)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if atol is None:
        atol = np.spacing(180.0)  # eps(180.0), as in the reference
    return bool(np.all(np.abs(_wrap_lon_delta(a, b)) <= atol))


def detect_topology(lon_vertices, lat_vertices, nz: int) -> GridTopology:
    """Classify the grid as bipolar / tripolar / unknown.

    Mirrors `getgridtopology` (gridtopology.jl:33-53): looks at the
    northernmost row's NE/NW vertices. All-lat==90 => bipolar; the north
    edge mapping onto itself under rot180 => tripolar fold.

    `lon_vertices`/`lat_vertices` are canonical (4, ny, nx) with vertex
    order SW, SE, NE, NW.
    """
    lon_vertices = np.asarray(lon_vertices, dtype=np.float64)
    lat_vertices = np.asarray(lat_vertices, dtype=np.float64)
    _, ny, nx = lon_vertices.shape
    # NE, NW vertices of the top row: shape (2, nx)
    np_lon = lon_vertices[2:4, ny - 1, :]
    np_lat = lat_vertices[2:4, ny - 1, :]
    rot = lambda x: x[::-1, ::-1]
    if np.all(np_lat == 90.0):
        kind = BIPOLAR
    elif isapprox_lon(np_lon, rot(np_lon)) and np.allclose(
        np_lat, rot(np_lat), rtol=np.sqrt(np.finfo(np.float64).eps), atol=0.0
    ):
        kind = TRIPOLAR
    else:
        import warnings

        warnings.warn(
            "Unknown grid topology detected. Things might not work as "
            "expected. See `detect_topology` to see what failed the checks.",
            stacklevel=2,
        )
        kind = UNKNOWN
    return GridTopology(kind=kind, nx=nx, ny=ny, nz=nz)


# ---------------------------------------------------------------------------
# Array-level neighbor access.
# Arrays are [..., j, i] (2D trailing dims) or [..., k, j, i] (3D).
# ---------------------------------------------------------------------------


def _require_known(topo: GridTopology) -> None:
    """The reference's neighbor functions error on unknown grids
    (gridtopology.jl:111-116); this is the single equivalent choke point
    for every array-level neighbor access. `kind` is static metadata, so
    the check is jit-safe. Users with a bipolar-like grid that failed
    detection can opt in explicitly via
    `dataclasses.replace(gm, topology=GridTopology("bipolar", nx, ny, nz))`.
    """
    if topo.kind == UNKNOWN:
        raise ValueError(
            "Unknown grid type: neighbor access is undefined for grids whose "
            "topology could not be classified (see detect_topology)."
        )


def _axis(direction: Direction) -> int:
    if direction in ("east", "west"):
        return -1
    if direction in ("north", "south"):
        return -2
    return -3


def fold_i(x):
    """Reverse the i axis — the tripolar seam pairing i -> nx-1-i."""
    return jnp.flip(x, axis=-1)


def neighbor_values(x, direction: Direction, topo: GridTopology, fill=jnp.nan):
    """Value of the `direction`-neighbor of every cell, `fill` where none.

    For 3D input the array is [..., k, j, i]; "top" means k-1 (towards the
    surface) and "bottom" k+1 (towards the seafloor), matching the
    reference's k₋₁/k₊₁.
    """
    _require_known(topo)
    x = jnp.asarray(x)
    if direction == "east":
        return jnp.roll(x, -1, axis=-1)
    if direction == "west":
        return jnp.roll(x, 1, axis=-1)
    if direction == "north":
        interior = x[..., 1:, :]
        if topo.is_tripolar:
            last = x[..., -1:, ::-1]
        else:
            last = jnp.full_like(x[..., -1:, :], fill)
        return jnp.concatenate([interior, last], axis=-2)
    if direction == "south":
        first = jnp.full_like(x[..., :1, :], fill)
        return jnp.concatenate([first, x[..., :-1, :]], axis=-2)
    if direction == "bottom":
        interior = x[..., 1:, :, :]
        last = jnp.full_like(x[..., -1:, :, :], fill)
        return jnp.concatenate([interior, last], axis=-3)
    if direction == "top":
        first = jnp.full_like(x[..., :1, :, :], fill)
        return jnp.concatenate([first, x[..., :-1, :, :]], axis=-3)
    raise ValueError(f"unknown direction {direction!r}")


def neighbor_valid(direction: Direction, topo: GridTopology, ndim: int = 3):
    """Boolean connectivity mask: True where a `direction`-neighbor exists.

    Mirrors the `nothing`-returning boundaries of the reference neighbor
    functions (gridtopology.jl:57-68,94-95).
    """
    _require_known(topo)
    if ndim == 3:
        shape = topo.shape3d
    else:
        shape = topo.shape2d
    valid = np.ones(shape, dtype=bool)
    if direction in ("east", "west"):
        pass  # periodic
    elif direction == "north":
        if not topo.is_tripolar:
            valid[..., -1, :] = False
    elif direction == "south":
        valid[..., 0, :] = False
    elif direction == "bottom":
        if ndim != 3:
            raise ValueError("vertical direction on 2D grid")
        valid[-1, :, :] = False  # last k level
    elif direction == "top":
        if ndim != 3:
            raise ValueError("vertical direction on 2D grid")
        valid[0, :, :] = False
    else:
        raise ValueError(f"unknown direction {direction!r}")
    return jnp.asarray(valid)


def shift_values(x, axis: str, n: int, topo: GridTopology, fill=jnp.nan):
    """Value at the cell `n` steps along `axis` in {"i", "j", "k"}, `fill`
    where that cell does not exist.

    Array-level counterpart of the reference's ishift/jshift/kshift
    (gridtopology.jl:72-85): periodic wrap in i; out-of-range j/k filled.
    For tripolar grids, one step beyond the top row lands on the folded
    top row itself ((i, ny) -> (nx-1-i, ny)), mirroring jshift's n=+1
    behavior (gridtopology.jl:97-108); shifts further than one row past
    the seam are filled.
    """
    _require_known(topo)
    x = jnp.asarray(x)
    if n == 0:
        return x
    if axis == "i":
        return jnp.roll(x, -n, axis=-1)
    if axis == "j":
        ax = -2
        ny = x.shape[ax]
        if abs(n) >= ny:
            return jnp.full_like(x, fill)
        if n > 0:
            shifted = x[..., n:, :]
            if topo.is_tripolar and n == 1:
                tail = x[..., -1:, ::-1]
            else:
                tail = jnp.full_like(x[..., :n, :], fill)
            return jnp.concatenate([shifted, tail], axis=ax)
        head = jnp.full_like(x[..., :(-n), :], fill)
        return jnp.concatenate([head, x[..., :n, :]], axis=ax)
    if axis == "k":
        ax = -3
        nz = x.shape[ax]
        if abs(n) >= nz:
            return jnp.full_like(x, fill)
        if n > 0:
            tail = jnp.full_like(x[..., :n, :, :], fill)
            return jnp.concatenate([x[..., n:, :, :], tail], axis=ax)
        head = jnp.full_like(x[..., :(-n), :, :], fill)
        return jnp.concatenate([head, x[..., :n, :, :]], axis=ax)
    raise ValueError(f"axis must be 'i', 'j', or 'k', got {axis!r}")


def scatter_to_neighbor(x, direction: Direction, topo: GridTopology):
    """Adjoint of `neighbor_values` (with fill=0).

    `scatter_to_neighbor(x, d)[c] = sum over cells whose d-neighbor is c of
    x` — i.e. moves data *to* each cell's `direction`-neighbor. Used for
    transpose-free reverse shifts; it equals `neighbor_values` in the
    opposite direction except at the tripolar seam, where the fold is its
    own inverse so north/south remain mutually adjoint.
    """
    _require_known(topo)
    x = jnp.asarray(x)
    if direction == "east":
        return jnp.roll(x, 1, axis=-1)
    if direction == "west":
        return jnp.roll(x, -1, axis=-1)
    if direction == "north":
        # value of cell c lands on j+1 (or the folded cell at the seam)
        out_interior = x[..., :-1, :]
        if topo.is_tripolar:
            last = x[..., -1:, ::-1]
        else:
            last = jnp.zeros_like(x[..., -1:, :])
        first = jnp.zeros_like(x[..., :1, :])
        lower = jnp.concatenate([first, out_interior], axis=-2)
        return lower.at[..., -1:, :].add(last) if topo.is_tripolar else lower
    if direction == "south":
        out = x[..., 1:, :]
        last = jnp.zeros_like(x[..., -1:, :])
        return jnp.concatenate([out, last], axis=-2)
    if direction == "bottom":
        first = jnp.zeros_like(x[..., :1, :, :])
        return jnp.concatenate([first, x[..., :-1, :, :]], axis=-3)
    if direction == "top":
        last = jnp.zeros_like(x[..., -1:, :, :])
        return jnp.concatenate([x[..., 1:, :, :], last], axis=-3)
    raise ValueError(f"unknown direction {direction!r}")
