"""Wet-cell index machinery.

The reference's `makeindices` (src/matrixbuilding.jl:10-24) builds the
wet-linear-index maps needed for host-side sparse assembly. On TPU the
main compute path keeps everything as dense (nz, ny, nx) fields with a
boolean wet mask — gathers to a wet vector would defeat XLA tiling. The
wet-vector view is still provided (host-side, numpy) for sparse export,
validation against the reference matrix, and the `as2D`/`as3D` reshape
utilities.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Indices:
    """Wet-cell masks and counts (analog of the reference `indices` tuple).

    `wet3d` is the on-device mask; the linear maps (`lwet`, `lwet3d`) are
    host numpy arrays used only for sparse export / validation, mirroring
    `makeindices`'s Lwet / Lwet3D (matrixbuilding.jl:10-24). Linear order
    is C-order over the canonical (nz, ny, nx) layout.

    Deliberately NOT a pytree: index construction is one-time host-side
    preprocessing. Jitted code should take `wet3d` (a plain array) alone.
    """

    wet3d: jax.Array  # (nz, ny, nx) bool
    nwet: int
    lwet: np.ndarray
    lwet3d: np.ndarray

    @property
    def shape(self) -> tuple[int, int, int]:
        return tuple(self.wet3d.shape)


def makeindices(v3d) -> Indices:
    """Build wet indices from the (NaN-on-land) volume field.

    Counterpart of the reference `makeindices` (matrixbuilding.jl:10-24):
    wet cells are those with finite volume.
    """
    v3d_np = np.asarray(v3d)
    wet3d_np = np.isfinite(v3d_np)
    flat = wet3d_np.reshape(-1)
    lwet = np.flatnonzero(flat)
    lwet3d = np.full(flat.shape, -1, dtype=np.int64)
    lwet3d[lwet] = np.arange(lwet.size)
    lwet3d = lwet3d.reshape(v3d_np.shape)
    return Indices(
        wet3d=jnp.asarray(wet3d_np),
        nwet=int(lwet.size),
        lwet=lwet,
        lwet3d=lwet3d,
    )


def wet_vector(field3d, indices: Indices) -> np.ndarray:
    """Gather a 3D field to the length-N wet vector (host-side)."""
    return np.asarray(field3d).reshape(-1)[indices.lwet]


def as3d(x, wet3d) -> np.ndarray:
    """Scatter a wet vector back to a NaN-filled 3D field.

    Counterpart of `as3D` (extratools.jl:127-135).
    """
    wet3d = np.asarray(wet3d)
    x = np.asarray(x)
    if x.size != int(wet3d.sum()):
        raise ValueError(f"wet vector length {x.size} != {int(wet3d.sum())} wet cells")
    out = np.full(wet3d.shape, np.nan, dtype=np.result_type(x.dtype, np.float32))
    out[wet3d] = x
    return out


def as2d(x, wet3d) -> np.ndarray:
    """Scatter a surface wet vector to a NaN-filled 2D field.

    Counterpart of `as2D` (extratools.jl:115-124); the surface layer is
    k = 0 in canonical layout.
    """
    wet3d = np.asarray(wet3d)
    surf = wet3d[0]
    x = np.asarray(x)
    if x.size != int(surf.sum()):
        raise ValueError(f"vector length {x.size} != {int(surf.sum())} surface wet cells")
    out = np.full(surf.shape, np.nan, dtype=np.result_type(x.dtype, np.float32))
    out[surf] = x
    return out
