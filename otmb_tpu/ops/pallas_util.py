"""Shared helpers for the Pallas TPU kernels.

No reference counterpart (the reference has no native kernels); this
module exists to keep kernel-construction hygiene in one place.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def index_map_i32(fn):
    """Coerce every element a BlockSpec index map returns to int32.

    Under ``jax_enable_x64`` a bare Python int literal in an index map
    traces as a weak i64 while the Pallas program ids stay i32; Mosaic
    then refuses to legalize the mixed-width block-index function
    (observed on v5e: ``failed to legalize operation 'func.return'``
    with operands ``(i64, i32, i32)`` — the exact failure that killed
    the round-3 0.25-degree refined ideal-age solve, whose f64 defect
    correction flips x64 on process-wide). Coercing each element to
    int32 is a no-op for program-id-derived values and makes literals
    safe under either x64 setting. Repro: tests/test_x64_pallas.py.
    """

    @functools.wraps(fn)
    def wrapped(*idx):
        return tuple(jnp.asarray(v, jnp.int32) for v in fn(*idx))

    return wrapped
