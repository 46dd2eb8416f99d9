"""Multichip hot path: ppermute halo exchange + shard-local Pallas stencil.

GSPMD cannot auto-partition a Pallas custom call, so the sharded jnp path
(parallel/halo.py) is used for correctness while this module provides the
production combination: the same 1-cell halo exchange (periodic x,
tripolar mirror-shard fold) feeding a *shard-local* fused stencil kernel.
Inside the shard the domain is a plain open box — the seam and the
periodic wrap live entirely in the exchanged halos — so the kernel works
on local slabs plus four tiny halo streams (north/south rows, east/west
columns).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_util import index_map_i32
from jax.sharding import Mesh, PartitionSpec as P

from ..grid.topology import GridTopology
from ..ops.coeffs import StencilCoeffs
from .halo import _halo_exchange


def _stencil_kernel_local(
    diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
    chi_ref, chi_up_ref, chi_dn_ref,
    n_row_ref, s_row_ref, e_col_ref, w_col_ref,
    out_ref,
    *,
    dt: float | None,
):
    chi = chi_ref[0]
    ny_l, nx_l = chi.shape

    # lane shifts with the shard-boundary columns patched in
    east0 = pltpu.roll(chi, nx_l - 1, 1)
    west0 = pltpu.roll(chi, 1, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 1)
    east = jnp.where(col == nx_l - 1, e_col_ref[0], east0)
    west = jnp.where(col == 0, w_col_ref[0], west0)

    north = jnp.concatenate([chi[1:, :], n_row_ref[0]], axis=0)
    south = jnp.concatenate([s_row_ref[0], chi[: ny_l - 1, :]], axis=0)

    up = lambda r: r[0].astype(chi.dtype)
    acc = up(diag_ref) * chi
    acc += up(e_ref) * east + up(w_ref) * west
    acc += up(n_ref) * north + up(s_ref) * south
    acc += up(t_ref) * chi_up_ref[0] + up(b_ref) * chi_dn_ref[0]

    if dt is not None:
        acc = chi - dt * acc
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("dt_static", "interpret"))
def _local_pallas_apply(coeffs_local, chi_local, halos, dt_static,
                        interpret: bool):
    nz, ny_l, nx_l = chi_local.shape
    dtype = chi_local.dtype
    east_h, west_h, north_h, south_h = halos  # (nz,ny_l,1) x2, (nz,1,nx_l) x2

    slab = lambda k: (k, 0, 0)
    slab_up = lambda k: (jnp.maximum(k - 1, 0), 0, 0)
    slab_dn = lambda k: (jnp.minimum(k + 1, nz - 1), 0, 0)

    def spec(index_map, block):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_stencil_kernel_local, dt=dt_static)
    full = (1, ny_l, nx_l)

    return pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[spec(slab, full)] * 7
        + [spec(slab, full), spec(slab_up, full), spec(slab_dn, full)]
        + [
            spec(slab, (1, 1, nx_l)),  # north row
            spec(slab, (1, 1, nx_l)),  # south row
            spec(slab, (1, ny_l, 1)),  # east col
            spec(slab, (1, ny_l, 1)),  # west col
        ],
        out_specs=spec(slab, full),
        out_shape=jax.ShapeDtypeStruct((nz, ny_l, nx_l), dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        coeffs_local.diag, coeffs_local.east, coeffs_local.west,
        coeffs_local.north, coeffs_local.south, coeffs_local.top,
        coeffs_local.bottom, chi_local, chi_local, chi_local,
        north_h.astype(dtype), south_h.astype(dtype),
        east_h.astype(dtype), west_h.astype(dtype),
    )


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def apply_stencil_halo_pallas(
    coeffs: StencilCoeffs,
    chi,
    topology: GridTopology,
    mesh: Mesh,
    interpret: bool | None = None,
    overlap: bool = False,
):
    """y = T @ chi: ppermute halos + per-shard fused Pallas kernel.

    `overlap=True` uses the interior/boundary split (see
    `euler_propagate_halo_pallas`)."""
    return _halo_pallas(coeffs, jnp.asarray(chi), topology, mesh, None,
                        interpret, overlap)


def euler_propagate_halo_pallas(
    coeffs: StencilCoeffs,
    chi,
    dt: float,
    nsteps: int,
    topology: GridTopology,
    mesh: Mesh,
    interpret: bool | None = None,
    overlap: bool = True,
):
    """nsteps of chi - dt*T@chi with the halo exchange and the Pallas
    kernel inside one shard_map region (no per-step resharding).

    `overlap=True` (default) removes the halo latency from the critical
    path: the Pallas kernel runs on ZERO halos — so it has no data
    dependency on the ppermutes and XLA schedules the collective-permutes
    concurrently with the (opaque) kernel — and the four boundary
    rows/columns are patched with the halo contributions when the
    permutes land (each a tiny O(edge) elementwise add; same split as
    parallel/halo._local_stencil_overlapped). Whether overlap pays on a
    given mesh is quantified by `utils.profiling.halo_comm_model`
    (scaling_efficiency_overlapped vs _serial)."""
    return _halo_pallas(coeffs, jnp.asarray(chi), topology, mesh,
                        (float(dt), int(nsteps)), interpret, overlap)


def _boundary_patch(coeffs_local, bulk, halos, scale):
    """Add the halo contributions to the shard-boundary slices of a bulk
    (zero-halo) kernel result: coef_edge * halo, scaled by -dt in the
    fused-Euler case. The kernel computed exactly 0 for these terms (the
    zero halo multiplies the same coefficients), so this reconstructs the
    non-overlapped result up to summation order (~1 ulp at the edges).

    Rank-agnostic: `bulk`/halos may carry a leading tracer-batch axis
    (the rank-3 coefficient edges broadcast across it)."""
    east_h, west_h, north_h, south_h = halos
    bulk = bulk.at[..., -1].add(
        scale * coeffs_local.east[:, :, -1] * east_h[..., 0]
    )
    bulk = bulk.at[..., 0].add(
        scale * coeffs_local.west[:, :, 0] * west_h[..., 0]
    )
    bulk = bulk.at[..., -1, :].add(
        scale * coeffs_local.north[:, -1, :] * north_h[..., 0, :]
    )
    bulk = bulk.at[..., 0, :].add(
        scale * coeffs_local.south[:, 0, :] * south_h[..., 0, :]
    )
    return bulk


def _halo_pallas(coeffs, chi, topology, mesh, dt_steps, interpret,
                 overlap=False):
    if interpret is None:
        interpret = _default_interpret()
    spec3 = P(None, "y", "x")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: spec3, coeffs), spec3),
        out_specs=spec3,
        # pallas_call outputs carry no varying-mesh-axis metadata
        check_vma=False,
    )
    def _run(coeffs_local, chi_local):
        def one(c, fused_dt):
            halos = _halo_exchange(c, topology, mesh)
            if not overlap:
                return _local_pallas_apply(coeffs_local, c, halos, fused_dt,
                                           interpret)
            # Interior pass on zero halos: no data dependency on the
            # ppermutes, so they run concurrently with the kernel.
            zeros = tuple(jnp.zeros_like(h) for h in halos)
            bulk = _local_pallas_apply(coeffs_local, c, zeros, fused_dt,
                                       interpret)
            scale = jnp.asarray(
                1.0 if fused_dt is None else -fused_dt, bulk.dtype
            )
            return _boundary_patch(coeffs_local, bulk, halos, scale)

        if dt_steps is None:
            return one(chi_local, None)
        dt, nsteps = dt_steps
        return jax.lax.fori_loop(
            0, nsteps, lambda i, c: one(c, dt), chi_local
        )

    return _run(coeffs, chi)


# ---------------------------------------------------------------------------
# Multi-tracer shard-local path
# ---------------------------------------------------------------------------
#
# The batched analogue of the single-tracer path above, mirroring
# ops/stencil_pallas.py's multi-tracer kernel: B tracers move through one
# shard-local kernel whose (1, ny_l, nx_l) coefficient blocks are shared
# across (B, 1, ny_l, nx_l) tracer blocks, and the four halo exchanges
# batch over the tracer axis inside the same four ppermutes (the halo
# payloads just grow a leading B axis — no extra collectives).


def _stencil_kernel_local_multi(
    diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
    chi_ref, chi_up_ref, chi_dn_ref,
    n_row_ref, s_row_ref, e_col_ref, w_col_ref,
    out_ref,
    *,
    dt: float | None,
):
    chi = chi_ref[:, 0]  # (B, ny_l, nx_l)
    _, ny_l, nx_l = chi.shape

    east0 = pltpu.roll(chi, nx_l - 1, 2)
    west0 = pltpu.roll(chi, 1, 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 1)
    east = jnp.where(col == nx_l - 1, e_col_ref[:, 0], east0)
    west = jnp.where(col == 0, w_col_ref[:, 0], west0)

    north = jnp.concatenate([chi[:, 1:, :], n_row_ref[:, 0]], axis=1)
    south = jnp.concatenate([s_row_ref[:, 0], chi[:, : ny_l - 1, :]],
                            axis=1)

    up = lambda r: r[0].astype(chi.dtype)  # (ny_l, nx_l) -> broadcast on B
    acc = up(diag_ref) * chi
    acc += up(e_ref) * east + up(w_ref) * west
    acc += up(n_ref) * north + up(s_ref) * south
    acc += up(t_ref) * chi_up_ref[:, 0] + up(b_ref) * chi_dn_ref[:, 0]

    if dt is not None:
        acc = chi - dt * acc
    out_ref[:, 0] = acc


@functools.partial(jax.jit, static_argnames=("dt_static", "interpret"))
def _local_pallas_apply_multi(coeffs_local, chis_local, halos, dt_static,
                              interpret: bool):
    B, nz, ny_l, nx_l = chis_local.shape
    dtype = chis_local.dtype
    east_h, west_h, north_h, south_h = halos  # (B,nz,ny_l,1) x2, (B,nz,1,nx_l) x2

    coef_k = lambda k: (k, 0, 0)
    slab = lambda k: (0, k, 0, 0)
    slab_up = lambda k: (0, jnp.maximum(k - 1, 0), 0, 0)
    slab_dn = lambda k: (0, jnp.minimum(k + 1, nz - 1), 0, 0)

    def spec(index_map, block):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_stencil_kernel_local_multi, dt=dt_static)
    full = (B, 1, ny_l, nx_l)

    return pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[spec(coef_k, (1, ny_l, nx_l))] * 7
        + [spec(slab, full), spec(slab_up, full), spec(slab_dn, full)]
        + [
            spec(slab, (B, 1, 1, nx_l)),  # north rows
            spec(slab, (B, 1, 1, nx_l)),  # south rows
            spec(slab, (B, 1, ny_l, 1)),  # east cols
            spec(slab, (B, 1, ny_l, 1)),  # west cols
        ],
        out_specs=spec(slab, full),
        out_shape=jax.ShapeDtypeStruct((B, nz, ny_l, nx_l), dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        coeffs_local.diag, coeffs_local.east, coeffs_local.west,
        coeffs_local.north, coeffs_local.south, coeffs_local.top,
        coeffs_local.bottom, chis_local, chis_local, chis_local,
        north_h.astype(dtype), south_h.astype(dtype),
        east_h.astype(dtype), west_h.astype(dtype),
    )


def apply_stencil_halo_pallas_multi(
    coeffs: StencilCoeffs,
    chis,
    topology: GridTopology,
    mesh: Mesh,
    interpret: bool | None = None,
    overlap: bool = False,
):
    """y[b] = T @ chis[b] for a (B, nz, ny, nx) tracer stack: four
    batched ppermute halo exchanges + one shard-local batched kernel."""
    return _halo_pallas_multi(coeffs, jnp.asarray(chis), topology, mesh,
                              None, interpret, overlap)


def euler_propagate_halo_pallas_multi(
    coeffs: StencilCoeffs,
    chis,
    dt: float,
    nsteps: int,
    topology: GridTopology,
    mesh: Mesh,
    interpret: bool | None = None,
    overlap: bool = True,
):
    """nsteps of the batched fused Euler step inside one shard_map
    region; `overlap=True` runs the kernel on zero halos concurrently
    with the ppermutes and patches the boundary slices when they land
    (see `euler_propagate_halo_pallas`)."""
    return _halo_pallas_multi(coeffs, jnp.asarray(chis), topology, mesh,
                              (float(dt), int(nsteps)), interpret, overlap)


def _halo_pallas_multi(coeffs, chis, topology, mesh, dt_steps, interpret,
                       overlap=False):
    if interpret is None:
        interpret = _default_interpret()
    if chis.ndim != 4:
        raise ValueError(f"chis must be (B, nz, ny, nx); got {chis.shape}")
    spec3 = P(None, "y", "x")
    spec4 = P(None, None, "y", "x")

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: spec3, coeffs), spec4),
        out_specs=spec4,
        check_vma=False,
    )
    def _run(coeffs_local, chis_local):
        def one(c, fused_dt):
            halos = _halo_exchange(c, topology, mesh)
            if not overlap:
                return _local_pallas_apply_multi(coeffs_local, c, halos,
                                                 fused_dt, interpret)
            zeros = tuple(jnp.zeros_like(h) for h in halos)
            bulk = _local_pallas_apply_multi(coeffs_local, c, zeros,
                                             fused_dt, interpret)
            scale = jnp.asarray(
                1.0 if fused_dt is None else -fused_dt, bulk.dtype
            )
            return _boundary_patch(coeffs_local, bulk, halos, scale)

        if dt_steps is None:
            return one(chis_local, None)
        dt, nsteps = dt_steps
        return jax.lax.fori_loop(
            0, nsteps, lambda i, c: one(c, dt), chis_local
        )

    return _run(coeffs, chis)
