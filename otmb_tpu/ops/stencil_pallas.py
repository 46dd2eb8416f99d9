"""Fused Pallas TPU kernel for the 7-point transport stencil.

The hot path of the engine: y = T @ chi (optionally fused with the Euler
update chi - dt*T@chi) over (nz, ny, nx) fields. One grid step per k
level; each program loads the chi slabs for k-1, k, k+1 and the seven
coefficient slabs into VMEM and does all neighbor algebra on-chip:

  * east/west — lane rolls (periodic longitude);
  * north/south — sublane shifts, with the tripolar fold realized as a
    lane-reversal of the top row (reference gridtopology.jl:94-95);
  * top/bottom — the adjacent-k chi slabs (clamped at the boundaries,
    where the corresponding coefficients are exactly zero).

The kernel is memory-bound by design: 8 reads + 1 write per cell, no
recomputation, everything else fused. Roofline = HBM bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid.topology import GridTopology
from .coeffs import StencilCoeffs


def _stencil_kernel(
    diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
    chi_ref, chi_up_ref, chi_dn_ref, seam_ref,
    out_ref,
    *,
    ny: int,
    dt: float | None,
):
    chi = chi_ref[0]

    nx = chi.shape[1]
    # pltpu.roll requires non-negative shifts: roll(x, nx-1) == roll(x, -1)
    east = pltpu.roll(chi, nx - 1, 1)  # value at i+1 (periodic)
    west = pltpu.roll(chi, 1, 1)  # value at i-1

    # j+1 neighbor: shift rows down; the top row wraps across the seam.
    # Mosaic has no in-kernel lane reversal (`rev`), so the i-reversed top
    # row (tripolar) — or a dead row (bipolar, zero coef) — is precomputed
    # outside and streamed in as `seam_ref` (nz x nx, negligible traffic).
    north = jnp.concatenate([chi[1:, :], seam_ref[0]], axis=0)
    south = jnp.concatenate([chi[0:1, :], chi[: ny - 1, :]], axis=0)

    up = lambda r: r[0].astype(chi.dtype)
    acc = up(diag_ref) * chi
    acc += up(e_ref) * east + up(w_ref) * west
    acc += up(n_ref) * north + up(s_ref) * south
    acc += up(t_ref) * chi_up_ref[0] + up(b_ref) * chi_dn_ref[0]

    if dt is not None:
        acc = chi - dt * acc
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("topology", "dt_static", "interpret")
)
def _apply_pallas(coeffs: StencilCoeffs, chi, topology: GridTopology,
                  dt_static, interpret: bool):
    nz, ny, nx = topology.shape3d
    chi = jnp.asarray(chi)
    dtype = chi.dtype

    slab = lambda k: (k, 0, 0)
    slab_up = lambda k: (jnp.maximum(k - 1, 0), 0, 0)
    slab_dn = lambda k: (jnp.minimum(k + 1, nz - 1), 0, 0)

    def spec(index_map, block=(1, ny, nx)):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    # Seam row for the j+1 neighbor of the top row: i-reversed top row for
    # the tripolar fold (Mosaic has no in-kernel lane reversal, so it is
    # precomputed here); dead (zero-multiplied) row otherwise.
    if topology.is_tripolar:
        seam = chi[:, ny - 1, ::-1]
    else:
        seam = chi[:, ny - 1, :]
    seam = seam.reshape(nz, 1, nx)

    kernel = functools.partial(_stencil_kernel, ny=ny, dt=dt_static)

    return pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[spec(slab)] * 7
        + [spec(slab), spec(slab_up), spec(slab_dn), spec(slab, (1, 1, nx))],
        out_specs=spec(slab),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=15 * nz * ny * nx,
            bytes_accessed=9 * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
    )(
        coeffs.diag, coeffs.east, coeffs.west, coeffs.north,
        coeffs.south, coeffs.top, coeffs.bottom, chi, chi, chi,
        seam.astype(dtype),
    )


def _stencil_kernel_carry(
    diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
    chi_in_ref, seam_ref,
    out_ref,
    chi_scr,
    *,
    ny: int,
    dt: float | None,
):
    """k-carry variant: grid is (nz+1,) with logical k = step-1; the chi
    slabs for k-1 and k live in a 3-slot VMEM scratch rotation, so chi is
    streamed from HBM exactly once (the incoming block is chi[k+1]).
    HBM traffic drops from 11 to ~9 streams per cell."""
    step = pl.program_id(0)
    k = step - 1

    def slot_select(slot_idx):
        return jnp.where(
            slot_idx == 0,
            chi_scr[0],
            jnp.where(slot_idx == 1, chi_scr[1], chi_scr[2]),
        )

    @pl.when(step > 0)
    def _():
        chi = slot_select((k + 3) % 3)
        chi_up = slot_select((k + 2) % 3)  # (k-1) mod 3
        chi_up = jnp.where(k > 0, chi_up, 0.0)  # slot is garbage at k == 0
        chi_dn = chi_in_ref[0]  # chi[k+1] (clamped at the floor, coef 0)

        nx = chi.shape[1]
        east = pltpu.roll(chi, nx - 1, 1)
        west = pltpu.roll(chi, 1, 1)
        north = jnp.concatenate([chi[1:, :], seam_ref[0]], axis=0)
        south = jnp.concatenate([chi[0:1, :], chi[: ny - 1, :]], axis=0)

        up = lambda r: r[0].astype(chi.dtype)
        acc = up(diag_ref) * chi
        acc += up(e_ref) * east + up(w_ref) * west
        acc += up(n_ref) * north + up(s_ref) * south
        acc += up(t_ref) * chi_up + up(b_ref) * chi_dn

        if dt is not None:
            acc = chi - dt * acc
        out_ref[0] = acc

    # Rotate the incoming chi[k+1] into slot (k+1) mod 3 — never a slot
    # read this step, so there is no read/write ordering hazard.
    write_slot = step % 3
    for slot in range(3):
        @pl.when(write_slot == slot)
        def _(slot=slot):
            chi_scr[slot] = chi_in_ref[0]


@functools.partial(jax.jit, static_argnames=("topology", "dt_static", "interpret"))
def _apply_pallas_carry(coeffs: StencilCoeffs, chi, topology: GridTopology,
                        dt_static, interpret: bool):
    nz, ny, nx = topology.shape3d
    chi = jnp.asarray(chi)
    dtype = chi.dtype

    slab_k = lambda s: (jnp.maximum(s - 1, 0), 0, 0)
    slab_in = lambda s: (jnp.minimum(s, nz - 1), 0, 0)

    def spec(index_map, block=(1, ny, nx)):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    if topology.is_tripolar:
        seam = chi[:, ny - 1, ::-1]
    else:
        seam = chi[:, ny - 1, :]
    seam = seam.reshape(nz, 1, nx)

    kernel = functools.partial(_stencil_kernel_carry, ny=ny, dt=dt_static)

    return pl.pallas_call(
        kernel,
        grid=(nz + 1,),
        in_specs=[spec(slab_k)] * 7 + [spec(slab_in), spec(slab_k, (1, 1, nx))],
        out_specs=spec(slab_k),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        scratch_shapes=[pltpu.VMEM((3, ny, nx), dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=15 * nz * ny * nx,
            bytes_accessed=9 * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
    )(
        coeffs.diag, coeffs.east, coeffs.west, coeffs.north,
        coeffs.south, coeffs.top, coeffs.bottom, chi, seam.astype(dtype),
    )


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def apply_stencil_pallas(
    coeffs: StencilCoeffs,
    chi,
    topology: GridTopology,
    interpret: bool | None = None,
    variant: str = "carry",
):
    """y = T @ chi via the fused Pallas kernel.

    `interpret=None` auto-selects interpreter mode off-TPU so the kernel
    stays testable on the CPU backend. `variant`: "carry" (default —
    chi streamed once, k-slabs carried in VMEM scratch) or "simple"
    (chi streamed three times; kept as a fallback/reference kernel).
    """
    if interpret is None:
        interpret = _default_interpret()
    impl = _apply_pallas_carry if variant == "carry" else _apply_pallas
    return impl(coeffs, chi, topology, None, interpret)


def euler_step_pallas(
    coeffs: StencilCoeffs,
    chi,
    dt: float,
    topology: GridTopology,
    interpret: bool | None = None,
    variant: str = "carry",
):
    """chi - dt * T @ chi in a single fused kernel (no extra HBM pass for
    the AXPY)."""
    if interpret is None:
        interpret = _default_interpret()
    impl = _apply_pallas_carry if variant == "carry" else _apply_pallas
    return impl(coeffs, chi, topology, float(dt), interpret)
