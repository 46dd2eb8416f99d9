"""Six-face cell mass fluxes from Arakawa C-grid transports.

Capability parity with src/velocities.jl:118-255 of the reference, TPU-first:

  * no-flux boundary zeroing (`nofluxboundaries!`, velocities.jl:154-179)
    becomes whole-array `where` masking;
  * west/south faces are topology-aware shifted copies of east/north
    (velocities.jl:206-224);
  * the top/bottom mass-conservation closure — a sequential top-down
    k-sweep in the reference (velocities.jl:236-243) — is algebraically a
    *reversed cumulative sum* of the horizontal convergence over k, which
    XLA lowers to a single fused scan-free cumsum on TPU:
        phi_top[k]    = sum_{k' >= k} (W + S - E - N)[k']
        phi_bottom[k] = phi_top[k+1]   (0 at the seafloor).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..grid.geometry import GridMetrics
from ..grid.indices import Indices
from ..grid.topology import GridTopology, neighbor_valid, neighbor_values


class FaceFluxes(NamedTuple):
    """Mass flux (kg/s) through each face of every cell, positive along
    +i (east), +j (north), and *upward* for top/bottom, matching the
    reference's sign conventions."""

    east: jax.Array
    west: jax.Array
    north: jax.Array
    south: jax.Array
    top: jax.Array
    bottom: jax.Array


def _sanitize(x, fill_value):
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    if fill_value is not None:
        x = jnp.where(x == fill_value, 0.0, x)
    return x


def facefluxes(
    umo,
    vmo,
    wet3d,
    topology: GridTopology,
    fill_value: float | None = None,
) -> FaceFluxes:
    """Build the six-face flux tuple from east/north mass transports.

    Jittable core, counterpart of `facefluxes` (velocities.jl:190-255).
    `umo[c]` is the transport across the *east* face of cell c and `vmo[c]`
    across the *north* face (CMIP convention).
    """
    wet = jnp.asarray(wet3d, bool)
    umo = jnp.asarray(umo)
    vmo = jnp.asarray(vmo)

    phi_east = _sanitize(umo, fill_value)
    phi_north = _sanitize(vmo, fill_value)

    # No-flux boundaries (velocities.jl:154-179): zero the east/north flux
    # of land cells and of faces whose east/north neighbor is land or
    # nonexistent.
    east_nb_wet = neighbor_values(wet, "east", topology, fill=False)
    north_nb_wet = neighbor_values(wet, "north", topology, fill=False) & neighbor_valid(
        "north", topology
    )
    phi_east = jnp.where(wet & east_nb_wet, phi_east, 0.0)
    phi_north = jnp.where(wet & north_nb_wet, phi_north, 0.0)

    # West/south faces are the neighbor's east/north face
    # (velocities.jl:206-224); zero where the neighbor does not exist.
    phi_west = neighbor_values(phi_east, "west", topology, fill=0.0)
    phi_south = neighbor_values(phi_north, "south", topology, fill=0.0)

    # Vertical closure by mass conservation (velocities.jl:227-243).
    convergence = phi_west + phi_south - phi_east - phi_north
    phi_top = jnp.flip(jnp.cumsum(jnp.flip(convergence, axis=0), axis=0), axis=0)
    phi_bottom = jnp.concatenate(
        [phi_top[1:], jnp.zeros_like(phi_top[:1])], axis=0
    )

    return FaceFluxes(
        east=phi_east,
        west=phi_west,
        north=phi_north,
        south=phi_south,
        top=phi_top,
        bottom=phi_bottom,
    )


def facefluxesfrommasstransport(
    *,
    umo,
    vmo,
    gridmetrics: GridMetrics,
    indices: Indices,
    fill_value: float | None = None,
) -> FaceFluxes:
    """Front door matching the reference `facefluxesfrommasstransport`
    (velocities.jl:118-130). Densifies to the grid dtype and dispatches to
    `facefluxes`."""
    dtype = gridmetrics.v3d.dtype
    umo = jnp.asarray(umo, dtype)
    vmo = jnp.asarray(vmo, dtype)
    return facefluxes(
        umo, vmo, indices.wet3d, gridmetrics.topology, fill_value=fill_value
    )
