"""Checkpoint / resume: save and load operators and tracer state.

The reference has no persistence (SURVEY section 5 — matrices are rebuilt
each run). Here operator coefficient arrays and tracer fields can be
saved to a single .npz (host-portable, no extra deps) and restored,
so long propagation runs can resume and assembled operators can be reused
across sessions.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..grid.topology import GridTopology
from ..ops.coeffs import StencilCoeffs

_COEF_FIELDS = StencilCoeffs._fields


def save_operator(path, coeffs: StencilCoeffs, topology: GridTopology,
                  **extra_arrays) -> None:
    """Save a stencil operator (+ optional named arrays, e.g. a tracer
    state) to `path` (.npz)."""
    payload = {f"coef_{name}": np.asarray(getattr(coeffs, name))
               for name in _COEF_FIELDS}
    payload["topology_kind"] = np.asarray(topology.kind)
    payload["topology_dims"] = np.asarray([topology.nx, topology.ny, topology.nz])
    for key, arr in extra_arrays.items():
        payload[f"extra_{key}"] = np.asarray(arr)
    np.savez_compressed(path, **payload)


def load_operator(path):
    """Load (coeffs, topology, extras) saved by `save_operator`."""
    with np.load(path, allow_pickle=False) as data:
        coeffs = StencilCoeffs(
            **{name: jnp.asarray(data[f"coef_{name}"]) for name in _COEF_FIELDS}
        )
        nx, ny, nz = (int(v) for v in data["topology_dims"])
        topology = GridTopology(kind=str(data["topology_kind"]), nx=nx, ny=ny, nz=nz)
        extras = {
            key[len("extra_"):]: data[key]
            for key in data.files
            if key.startswith("extra_")
        }
    return coeffs, topology, extras


def save_state(path, **arrays) -> None:
    """Save named arrays (tracer fields, step counters as 0-d arrays)."""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_state(path) -> dict:
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}
