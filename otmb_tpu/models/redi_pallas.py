"""Fused Pallas TPU kernel for the Redi isoneutral diffusion operator.

Executes the exact algebra of `models.redi.redi_apply` (the branch-free
linear-coefficient form) in ONE bottom-up k sweep instead of ~10 XLA
passes. The data hazard of the 19-point stencil is the top-face flux:
cell k's divergence needs the flux on its k+1 face, whose cross terms
need the cell-centered horizontal derivatives of BOTH slabs. The sweep
therefore runs deep → shallow and defers each slab's divergence by one
step:

  step s (slab kp = nz-1-s):
    1. fresh slab quantities: dcz/dcx/dcy (weights precomputed in the
       operator), east/north face fluxes f_e/f_n;
    2. the top-face flux of slab kp+1 from this slab's dcx/dcy and the
       carried dcx/dcy of slab kp+1;
    3. WRITE div(kp+1) from the carried f_e/f_n/f_t — everything needed
       is now known;
    4. rotate fresh values into the VMEM carries.

HBM traffic: 17 slab streams per cell (15 coefficient arrays + chi + out;
chi is fetched ONCE — the kp and kp+1 slabs are carried in VMEM scratch,
only the kp-1 slab streams in each step) — ~2.6x less than the jnp
pipeline's measured traffic. Tripolar
seam: the fold row of chi is precomputed outside the kernel and streamed
in (Mosaic has no lane reversal); the carried dcz seam row multiplies
s_n == 0 (cross term disabled on seam faces, models/redi.py) so a dead
row substitutes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_util import index_map_i32

from ..ops.stencil_pallas import _default_interpret, _x64_off
from .redi import RediOperator


def _redi_kernel(
    chi_init_ref, chi_u_ref,
    ae_ref, se_ref, an_ref, sn_ref,
    czu_ref, czd_ref, cxe_ref, cxw_ref, cyn_ref, cys_ref,
    at1_ref, sti1_ref, stj1_ref, gt1_ref, invv1_ref,
    invde_ref, invdn_ref, seam_ref,
    out_ref,
    fe_s, fn_s, dcx_s, dcy_s, ft_s, chic_s, chid_s,
    *,
    ny: int,
):
    s = pl.program_id(0)

    # Carried slab-(kp+1) values — read BEFORE the rotation overwrites
    # them. At s == 0 the scratch is uninitialized; nothing is consumed
    # (the output write is masked below).
    fe_prev = fe_s[...]
    fn_prev = fn_s[...]
    dcx_prev = dcx_s[...]
    dcy_prev = dcy_s[...]
    ft_prev = ft_s[...]

    # chi slabs: only kp-1 is fetched from HBM each step; kp and kp+1 are
    # carried in VMEM (kp = the previous step's fetch, kp+1 = the previous
    # step's center). At s == 0 both scratches are uninitialized: the
    # center comes from the one-shot chi_init fetch (slab nz-1), and the
    # down slab equals the center (kp+1 index is clipped to nz-1 at the
    # floor) — the elementwise where never consumes the garbage lanes.
    chi_first = chi_init_ref[0]
    is0 = (s == 0)
    chi = jnp.where(is0, chi_first, chic_s[...])
    chi_u = chi_u_ref[0]  # slab kp-1 (clipped at the surface; cz_u == 0)
    chi_d = jnp.where(is0, chi_first, chid_s[...])  # slab kp+1
    nx = chi.shape[1]

    chi_e = pltpu.roll(chi, np.int32(nx - 1), 1)
    chi_w = pltpu.roll(chi, np.int32(1), 1)
    # north: seam row streamed in (i-reversed fold for tripolar; dead row
    # otherwise — its coefficients are zero); south: zero fill at j == 0
    # (cy_s and the f_n south-shift both demand exact zeros there).
    chi_n = jnp.concatenate([chi[1:, :], seam_ref[0]], axis=0)
    chi_s = jnp.concatenate([chi[0:1, :], chi[: ny - 1, :]], axis=0)

    up = lambda r: r[0].astype(chi.dtype)
    dcz = up(czu_ref) * (chi_u - chi) + up(czd_ref) * (chi - chi_d)
    dcx = up(cxe_ref) * (chi_e - chi) + up(cxw_ref) * (chi - chi_w)
    dcy = up(cyn_ref) * (chi_n - chi) + up(cys_ref) * (chi - chi_s)

    # Lateral face fluxes of slab kp.
    dcz_e = 0.5 * (dcz + pltpu.roll(dcz, np.int32(nx - 1), 1))
    # seam row multiplies s_n == 0 -> a dead self-row substitutes
    dcz_n = 0.5 * (dcz + jnp.concatenate([dcz[1:, :], dcz[-1:, :]], axis=0))
    f_e = up(ae_ref) * (up(invde_ref) * (chi_e - chi) + up(se_ref) * dcz_e)
    f_n = up(an_ref) * (up(invdn_ref) * (chi_n - chi) + up(sn_ref) * dcz_n)

    # Top-face flux of slab kp+1 (face between kp and kp+1): fresh dcx/dcy
    # are its k-1 side, carried dcx/dcy its own side. At s == 0 this is
    # the seafloor face of the deepest slab -> exact zero.
    dcx_t = 0.5 * (dcx_prev + dcx)
    dcy_t = 0.5 * (dcy_prev + dcy)
    ft_new = up(at1_ref) * (
        up(sti1_ref) * dcx_t + up(stj1_ref) * dcy_t
        + up(gt1_ref) * (chi - chi_d)
    )
    ft_new = jnp.where(s > 0, ft_new, 0.0)

    # Divergence of slab kp+1 (valid once its laterals have been carried).
    @pl.when(s > 0)
    def _():
        fe_w = pltpu.roll(fe_prev, np.int32(1), 1)
        fn_sh = jnp.concatenate(
            [jnp.zeros_like(fn_prev[0:1, :]), fn_prev[: ny - 1, :]], axis=0
        )
        out_ref[0] = up(invv1_ref) * (
            fe_prev - fe_w + fn_prev - fn_sh + ft_new - ft_prev
        )

    fe_s[...] = f_e
    fn_s[...] = f_n
    dcx_s[...] = dcx
    dcy_s[...] = dcy
    ft_s[...] = ft_new
    chid_s[...] = chi
    chic_s[...] = chi_u


@functools.partial(jax.jit, static_argnames=("interpret",))
def _redi_pallas(op: RediOperator, chi, interpret: bool):
    topo = op.topology
    nz, ny, nx = topo.shape3d
    chi = jnp.where(op.wet, jnp.asarray(chi), 0.0)
    dtype = chi.dtype

    if topo.is_tripolar:
        seam = chi[:, ny - 1, ::-1]
    else:
        seam = chi[:, ny - 1, :]
    seam = seam.reshape(nz, 1, nx).astype(dtype)

    # slab indices as functions of the grid step s (kp = nz-1-s)
    kp = lambda s: (jnp.clip(nz - 1 - s, 0, nz - 1), 0, 0)
    kp_up = lambda s: (jnp.clip(nz - 2 - s, 0, nz - 1), 0, 0)
    kp1 = lambda s: (jnp.clip(nz - s, 0, nz - 1), 0, 0)

    def spec(index_map, block=(1, ny, nx)):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    const2d = lambda s: (0, 0, 0)
    # Deepest slab, fetched once (the index map never changes, so the
    # pipeline re-uses the resident block instead of re-copying).
    deepest = lambda s: (nz - 1, 0, 0)

    kernel = functools.partial(_redi_kernel, ny=ny)
    f = lambda a: a if a.dtype == jnp.bfloat16 else a.astype(dtype)

    return pl.pallas_call(
        kernel,
        grid=(nz + 1,),
        in_specs=(
            [spec(deepest), spec(kp_up)]                 # chi init + up stream
            + [spec(kp)] * 10                            # ae..cy_s at kp
            + [spec(kp1)] * 5                            # at,s_ti,s_tj,g_t,inv_v at kp+1
            + [spec(const2d), spec(const2d)]             # inv_de, inv_dn
            + [spec(kp, (1, 1, nx))]                     # seam row
        ),
        out_specs=spec(kp1),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        scratch_shapes=[pltpu.VMEM((ny, nx), dtype)] * 7,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * nz * ny * nx,
            bytes_accessed=17 * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
    )(
        chi, chi,
        f(op.ae), f(op.s_e), f(op.an), f(op.s_n),
        f(op.cz_u), f(op.cz_d), f(op.cx_e), f(op.cx_w), f(op.cy_n), f(op.cy_s),
        f(op.at), f(op.s_ti), f(op.s_tj), f(op.g_t), f(op.inv_v),
        f(op.inv_de).reshape(1, ny, nx), f(op.inv_dn).reshape(1, ny, nx),
        seam,
    )


def _redi_kernel_blocked(
    chi_init_ref, chi_u_ref,
    ae_ref, se_ref, an_ref, sn_ref,
    czu_ref, czd_ref, cxe_ref, cxw_ref, cyn_ref, cys_ref,
    at1_ref, sti1_ref, stj1_ref, gt1_ref, invv1_ref,
    invde_ref, invdn_ref,
    chin_ref, chis_ref, dczn_ref, fns_ref,
    out_ref,
    fe_s, fn_s, dcx_s, dcy_s, ft_s, chic_s, chid_s,
    *,
    by: int,
):
    """j-blocked variant of `_redi_kernel` for grids whose slab set
    exceeds VMEM (0.25-degree scale). The j-halo quantities — the chi
    rows just outside the block, the dcz row above (the cross term is
    live at interior block edges), and the f_n row below (needed by the
    divergence's south shift) — arrive as tiny (1, nx) side streams
    pre-gathered outside the kernel. chi kp/kp+1 blocks are carried in
    VMEM exactly as in the full-slab kernel; s == 0 (once per j-block —
    s is the fast grid axis) re-seeds the carry from the one-shot
    deepest-slab fetch."""
    s = pl.program_id(1)

    fe_prev = fe_s[...]
    fn_prev = fn_s[...]
    dcx_prev = dcx_s[...]
    dcy_prev = dcy_s[...]
    ft_prev = ft_s[...]

    chi_first = chi_init_ref[0]
    is0 = (s == 0)
    chi = jnp.where(is0, chi_first, chic_s[...])
    chi_u = chi_u_ref[0]
    chi_d = jnp.where(is0, chi_first, chid_s[...])
    nx = chi.shape[1]

    chi_e = pltpu.roll(chi, np.int32(nx - 1), 1)
    chi_w = pltpu.roll(chi, np.int32(1), 1)
    chi_n = jnp.concatenate([chi[1:, :], chin_ref[0]], axis=0)
    chi_s = jnp.concatenate([chis_ref[0], chi[: by - 1, :]], axis=0)

    up = lambda r: r[0].astype(chi.dtype)
    dcz = up(czu_ref) * (chi_u - chi) + up(czd_ref) * (chi - chi_d)
    dcx = up(cxe_ref) * (chi_e - chi) + up(cxw_ref) * (chi - chi_w)
    dcy = up(cyn_ref) * (chi_n - chi) + up(cys_ref) * (chi - chi_s)

    dcz_e = 0.5 * (dcz + pltpu.roll(dcz, np.int32(nx - 1), 1))
    # interior block edges have a live cross term: real north row streamed
    dcz_n = 0.5 * (dcz + jnp.concatenate([dcz[1:, :], dczn_ref[0]], axis=0))
    f_e = up(ae_ref) * (up(invde_ref) * (chi_e - chi) + up(se_ref) * dcz_e)
    f_n = up(an_ref) * (up(invdn_ref) * (chi_n - chi) + up(sn_ref) * dcz_n)

    dcx_t = 0.5 * (dcx_prev + dcx)
    dcy_t = 0.5 * (dcy_prev + dcy)
    ft_new = up(at1_ref) * (
        up(sti1_ref) * dcx_t + up(stj1_ref) * dcy_t
        + up(gt1_ref) * (chi - chi_d)
    )
    ft_new = jnp.where(s > 0, ft_new, 0.0)

    @pl.when(s > 0)
    def _():
        fe_w = pltpu.roll(fe_prev, np.int32(1), 1)
        fn_sh = jnp.concatenate([fns_ref[0], fn_prev[: by - 1, :]], axis=0)
        out_ref[0] = up(invv1_ref) * (
            fe_prev - fe_w + fn_prev - fn_sh + ft_new - ft_prev
        )

    fe_s[...] = f_e
    fn_s[...] = f_n
    dcx_s[...] = dcx
    dcy_s[...] = dcy
    ft_s[...] = ft_new
    chid_s[...] = chi
    chic_s[...] = chi_u


def _rows_dcz(op: RediOperator, chi, rows):
    """dcz (cell-centered vertical derivative) at the given j rows, from
    row gathers only — (nz, len(rows), nx)."""
    chi_r = chi[:, rows, :]
    chi_up = jnp.concatenate([chi_r[:1], chi_r[:-1]], axis=0)  # cz_u(0)==0
    chi_dn = jnp.concatenate([chi_r[1:], chi_r[-1:]], axis=0)  # cz_d(nz-1)==0
    return (op.cz_u[:, rows, :] * (chi_up - chi_r)
            + op.cz_d[:, rows, :] * (chi_r - chi_dn))


@functools.partial(jax.jit, static_argnames=("interpret", "by_static"))
def _redi_pallas_blocked(op: RediOperator, chi, interpret: bool,
                         by_static=None):
    topo = op.topology
    nz, ny, nx = topo.shape3d
    chi = jnp.where(op.wet, jnp.asarray(chi), 0.0)
    dtype = chi.dtype

    by = by_static if by_static else _pick_redi_block(ny, nx, dtype.itemsize)
    nb = ny // by

    idx_n = np.minimum((np.arange(nb) + 1) * by, ny - 1)
    idx_s = np.maximum(np.arange(nb) * by - 1, 0)

    # chi rows just outside each block. The last block's north row is the
    # global boundary: the i-reversed seam row (tripolar; its coefficients
    # are live) or a dead row (bipolar; coefficients zero).
    chi_nrows = chi[:, idx_n, :]
    if topo.is_tripolar:
        chi_nrows = chi_nrows.at[:, -1, :].set(chi[:, ny - 1, ::-1])
    chi_srows = chi[:, idx_s, :]

    # dcz at the row above each block (zero-multiplied for the last block:
    # s_n == 0 at the seam, an == 0 at a bipolar top row).
    dcz_nrows = _rows_dcz(op, chi, idx_n)

    # f_n at the row below each block, for the divergence's south shift.
    # Pure row algebra; the row above idx_s is the block's own first row
    # (never the seam: idx_s <= ny - by - 1). Block 0 has no south face.
    dcz_s = _rows_dcz(op, chi, idx_s)
    dcz_s1 = _rows_dcz(op, chi, idx_s + 1)
    fn_srows = op.an[:, idx_s, :] * (
        op.inv_dn[idx_s, :] * (chi[:, idx_s + 1, :] - chi[:, idx_s, :])
        + op.s_n[:, idx_s, :] * 0.5 * (dcz_s + dcz_s1)
    )
    fn_srows = fn_srows.at[:, 0, :].set(0.0)

    rows = lambda a: a.astype(dtype).reshape(nz * nb, 1, nx)

    kp_i = lambda jb, s: (jnp.clip(nz - 1 - s, 0, nz - 1), jb, 0)
    kp_up_i = lambda jb, s: (jnp.clip(nz - 2 - s, 0, nz - 1), jb, 0)
    kp1_i = lambda jb, s: (jnp.clip(nz - s, 0, nz - 1), jb, 0)
    deepest_i = lambda jb, s: (nz - 1, jb, 0)  # one fetch per j-block
    row_kp = lambda jb, s: (jnp.clip(nz - 1 - s, 0, nz - 1) * nb + jb, 0, 0)
    row_kp1 = lambda jb, s: (jnp.clip(nz - s, 0, nz - 1) * nb + jb, 0, 0)
    const2d = lambda jb, s: (0, jb, 0)

    def spec(index_map, block=(1, by, nx)):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_redi_kernel_blocked, by=by)
    f = lambda a: a if a.dtype == jnp.bfloat16 else a.astype(dtype)

    return pl.pallas_call(
        kernel,
        grid=(nb, nz + 1),
        in_specs=(
            [spec(deepest_i), spec(kp_up_i)]
            + [spec(kp_i)] * 10
            + [spec(kp1_i)] * 5
            + [spec(const2d), spec(const2d)]
            + [spec(row_kp, (1, 1, nx))] * 2      # chi north/south rows
            + [spec(row_kp, (1, 1, nx))]          # dcz north row
            + [spec(row_kp1, (1, 1, nx))]         # f_n south row (slab kp+1)
        ),
        out_specs=spec(kp1_i),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        scratch_shapes=[pltpu.VMEM((by, nx), dtype)] * 7,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * nz * ny * nx,
            bytes_accessed=17 * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
    )(
        chi, chi,
        f(op.ae), f(op.s_e), f(op.an), f(op.s_n),
        f(op.cz_u), f(op.cz_d), f(op.cx_e), f(op.cx_w), f(op.cy_n), f(op.cy_s),
        f(op.at), f(op.s_ti), f(op.s_tj), f(op.g_t), f(op.inv_v),
        f(op.inv_de).reshape(1, ny, nx), f(op.inv_dn).reshape(1, ny, nx),
        rows(chi_nrows), rows(chi_srows), rows(dcz_nrows), rows(fn_srows),
    )


#: the full input block set must fit VMEM twice (pipeline double buffering)
_REDI_VMEM_BUDGET = 100 * 1024 * 1024


def redi_supported_by_pallas(op: RediOperator) -> bool:
    _, ny, nx = op.topology.shape3d
    return 2 * 22 * ny * nx * 4 <= _REDI_VMEM_BUDGET


def _pick_redi_block(ny: int, nx: int, itemsize: int) -> int:
    """Largest divisor of ny whose ~21-buffer double-buffered working set
    fits half the VMEM budget."""
    for by in sorted((d for d in range(1, ny + 1) if ny % d == 0),
                     reverse=True):
        if 2 * 21 * by * nx * itemsize <= _REDI_VMEM_BUDGET // 2:
            return by
    return 1


def redi_apply_pallas(op: RediOperator, chi, interpret: bool | None = None,
                      by_static: int | None = None):
    """d(chi)/dt of Redi isoneutral diffusion via the fused kernel.

    Bit-compatible with `redi_apply` up to float reassociation. Uses the
    full-slab kernel when a k slab's working set fits VMEM, the j-blocked
    kernel at 0.25-degree scale, and falls back to the jnp pipeline for
    64-bit fields on a real TPU.
    """
    from .redi import redi_apply

    if interpret is None:
        interpret = _default_interpret()
    chi = jnp.asarray(chi)
    if not interpret and chi.dtype.itemsize > 4:
        return redi_apply(op, chi)
    if redi_supported_by_pallas(op) and by_static is None:
        if interpret:
            return _redi_pallas(op, chi, True)
        with _x64_off():
            return _redi_pallas(op, chi, False)
    if interpret:
        return _redi_pallas_blocked(op, chi, True, by_static)
    with _x64_off():
        return _redi_pallas_blocked(op, chi, False, by_static)


# ---------------------------------------------------------------------------
# Batched multi-tracer variant: B tracers through ONE fused sweep with the
# 15 coefficient slabs fetched once per k level and broadcast across the
# batch — per-tracer HBM traffic (2 + 15/B) streams instead of 17. Same
# VMEM slab-carry as `_redi_kernel` with a leading batch axis everywhere
# chi-derived state lives.
# ---------------------------------------------------------------------------


def _redi_kernel_multi(
    chi_init_ref, chi_u_ref,
    ae_ref, se_ref, an_ref, sn_ref,
    czu_ref, czd_ref, cxe_ref, cxw_ref, cyn_ref, cys_ref,
    at1_ref, sti1_ref, stj1_ref, gt1_ref, invv1_ref,
    invde_ref, invdn_ref, seam_ref,
    out_ref,
    fe_s, fn_s, dcx_s, dcy_s, ft_s, chic_s, chid_s,
    *,
    ny: int,
):
    s = pl.program_id(0)

    fe_prev = fe_s[...]
    fn_prev = fn_s[...]
    dcx_prev = dcx_s[...]
    dcy_prev = dcy_s[...]
    ft_prev = ft_s[...]

    chi_first = chi_init_ref[:, 0]                    # (B, ny, nx)
    is0 = (s == 0)
    chi = jnp.where(is0, chi_first, chic_s[...])
    chi_u = chi_u_ref[:, 0]
    chi_d = jnp.where(is0, chi_first, chid_s[...])
    nx = chi.shape[2]

    chi_e = pltpu.roll(chi, np.int32(nx - 1), 2)
    chi_w = pltpu.roll(chi, np.int32(1), 2)
    chi_n = jnp.concatenate([chi[:, 1:, :], seam_ref[:, 0]], axis=1)
    chi_s = jnp.concatenate([chi[:, 0:1, :], chi[:, : ny - 1, :]], axis=1)

    up = lambda r: r[0].astype(chi.dtype)             # (ny,nx) -> broadcast
    dcz = up(czu_ref) * (chi_u - chi) + up(czd_ref) * (chi - chi_d)
    dcx = up(cxe_ref) * (chi_e - chi) + up(cxw_ref) * (chi - chi_w)
    dcy = up(cyn_ref) * (chi_n - chi) + up(cys_ref) * (chi - chi_s)

    dcz_e = 0.5 * (dcz + pltpu.roll(dcz, np.int32(nx - 1), 2))
    dcz_n = 0.5 * (dcz + jnp.concatenate(
        [dcz[:, 1:, :], dcz[:, -1:, :]], axis=1))
    f_e = up(ae_ref) * (up(invde_ref) * (chi_e - chi) + up(se_ref) * dcz_e)
    f_n = up(an_ref) * (up(invdn_ref) * (chi_n - chi) + up(sn_ref) * dcz_n)

    dcx_t = 0.5 * (dcx_prev + dcx)
    dcy_t = 0.5 * (dcy_prev + dcy)
    ft_new = up(at1_ref) * (
        up(sti1_ref) * dcx_t + up(stj1_ref) * dcy_t
        + up(gt1_ref) * (chi - chi_d)
    )
    ft_new = jnp.where(s > 0, ft_new, 0.0)

    @pl.when(s > 0)
    def _():
        fe_w = pltpu.roll(fe_prev, np.int32(1), 2)
        fn_sh = jnp.concatenate(
            [jnp.zeros_like(fn_prev[:, 0:1, :]), fn_prev[:, : ny - 1, :]],
            axis=1,
        )
        out_ref[:, 0] = up(invv1_ref) * (
            fe_prev - fe_w + fn_prev - fn_sh + ft_new - ft_prev
        )

    fe_s[...] = f_e
    fn_s[...] = f_n
    dcx_s[...] = dcx
    dcy_s[...] = dcy
    ft_s[...] = ft_new
    chid_s[...] = chi
    chic_s[...] = chi_u


@functools.partial(jax.jit, static_argnames=("interpret",))
def _redi_pallas_multi(op: RediOperator, chis, interpret: bool):
    topo = op.topology
    nz, ny, nx = topo.shape3d
    chis = jnp.where(op.wet, jnp.asarray(chis), 0.0)  # (B, nz, ny, nx)
    B = chis.shape[0]
    dtype = chis.dtype

    if topo.is_tripolar:
        seam = chis[:, :, ny - 1, ::-1]
    else:
        seam = chis[:, :, ny - 1, :]
    seam = seam.reshape(B, nz, 1, nx).astype(dtype)

    kp = lambda s: (jnp.clip(nz - 1 - s, 0, nz - 1), 0, 0)
    kp_up4 = lambda s: (0, jnp.clip(nz - 2 - s, 0, nz - 1), 0, 0)
    kp1 = lambda s: (jnp.clip(nz - s, 0, nz - 1), 0, 0)
    kp1_4 = lambda s: (0, jnp.clip(nz - s, 0, nz - 1), 0, 0)
    kp_seam = lambda s: (0, jnp.clip(nz - 1 - s, 0, nz - 1), 0, 0)
    const2d = lambda s: (0, 0, 0)
    deepest4 = lambda s: (0, nz - 1, 0, 0)  # one fetch

    def spec(index_map, block=(1, ny, nx)):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_redi_kernel_multi, ny=ny)
    f = lambda a: a if a.dtype == jnp.bfloat16 else a.astype(dtype)

    return pl.pallas_call(
        kernel,
        grid=(nz + 1,),
        in_specs=(
            [spec(deepest4, (B, 1, ny, nx)), spec(kp_up4, (B, 1, ny, nx))]
            + [spec(kp)] * 10
            + [spec(kp1)] * 5
            + [spec(const2d), spec(const2d)]
            + [spec(kp_seam, (B, 1, 1, nx))]
        ),
        out_specs=spec(kp1_4, (B, 1, ny, nx)),
        out_shape=jax.ShapeDtypeStruct((B, nz, ny, nx), dtype),
        scratch_shapes=[pltpu.VMEM((B, ny, nx), dtype)] * 7,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * B * nz * ny * nx,
            bytes_accessed=(2 * B + 15) * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
    )(
        chis, chis,
        f(op.ae), f(op.s_e), f(op.an), f(op.s_n),
        f(op.cz_u), f(op.cz_d), f(op.cx_e), f(op.cx_w), f(op.cy_n), f(op.cy_s),
        f(op.at), f(op.s_ti), f(op.s_tj), f(op.g_t), f(op.inv_v),
        f(op.inv_de).reshape(1, ny, nx), f(op.inv_dn).reshape(1, ny, nx),
        seam,
    )


def _redi_multi_vmem_ok(B: int, op: RediOperator, itemsize: int) -> bool:
    """7 batched scratch slabs + double-buffered batched chi/out blocks +
    the resident chi_init batch + double-buffered coefficient slabs."""
    _, ny, nx = op.topology.shape3d
    slab = ny * nx * itemsize
    need = (7 * B + 2 * 2 * B + B + 2 * 15) * slab
    return need <= _REDI_VMEM_BUDGET


def redi_apply_pallas_multi(op: RediOperator, chis,
                            interpret: bool | None = None):
    """d(chis[b])/dt for a batch of tracers in ONE fused Redi sweep.

    `chis` is (B, nz, ny, nx). The 15 coefficient slabs are fetched once
    per k level and broadcast across the batch, so per-tracer HBM traffic
    is (2 + 15/B) streams instead of 17. Falls back to a scanned
    single-tracer kernel when the batched working set exceeds VMEM."""
    from .redi import redi_apply

    if interpret is None:
        interpret = _default_interpret()
    chis = jnp.asarray(chis)
    if chis.ndim != 4:
        raise ValueError(f"chis must be (B, nz, ny, nx); got {chis.shape}")
    if not interpret and chis.dtype.itemsize > 4:
        return jax.lax.map(lambda c: redi_apply(op, c), chis)
    if _redi_multi_vmem_ok(chis.shape[0], op, chis.dtype.itemsize):
        if interpret:
            return _redi_pallas_multi(op, chis, True)
        with _x64_off():
            return _redi_pallas_multi(op, chis, False)
    return jax.lax.map(
        lambda c: redi_apply_pallas(op, c, interpret=interpret), chis
    )
