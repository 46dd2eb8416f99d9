"""Multichip Redi hot path: halo exchange + shard-local fused kernel.

The 19-point Redi stencil (models/redi.py) reaches two cells deep through
the face-flux cross terms, so a sharded apply needs more than the 7-point
stencil's single chi halo. Instead of a 2-cell halo, the cross-shard data
flows as 1-cell boundary lines inside one shard_map region — each
exchanging quantities whose payloads derive only from LOCAL data, so all
ppermutes issue in ONE concurrent communication round (total comm
latency = one neighbor round-trip per apply):

  * chi halos (east/west columns, north/south rows, tripolar mirror fold)
    via the same `_halo_exchange` as the 7-point path;
  * the cell-centered vertical derivative dcz — computed locally (it is
    k-local) — as east column + north row for the shard's own face
    fluxes (the north fold is unnecessary: the seam cross term
    multiplies s_n == 0, models/redi.py), and as west column + south
    row for receiver-side interface fluxes;
  * the neighbor's static coefficient lines (ae/inv_de/s_e east columns,
    an/inv_dn/s_n north rows), so each shard evaluates its OWN west/
    south interface fluxes with bitwise-identical operands and operand
    order — eliminating what used to be a third, serially dependent
    flux-exchange round.

The kernel itself is `models/redi_pallas._redi_kernel` with the periodic
lane rolls / self-row concats replaced by halo-patched shifts; the
deferred-divergence bottom-up k sweep and VMEM carries are unchanged.
Bit-exact vs the single-chip `redi_apply_pallas` (tested on the virtual
CPU mesh, both topologies).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_util import index_map_i32
from jax.sharding import Mesh, PartitionSpec as P

from ..models.redi import RediOperator
from ..ops.stencil_pallas import _default_interpret
from .halo import _halo_exchange
from .mesh import field_pspec


def _redi_kernel_shard(
    chi_init_ref, chi_u_ref,
    ae_ref, se_ref, an_ref, sn_ref,
    czu_ref, czd_ref, cxe_ref, cxw_ref, cyn_ref, cys_ref,
    at1_ref, sti1_ref, stj1_ref, gt1_ref, invv1_ref,
    invde_ref, invdn_ref,
    chie_ref, chiw_ref, chin_ref, chis_ref,
    dcze_ref, dczn_ref, few_ref, fns_ref,
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

    # chi kp/kp+1 carried in VMEM (seeded from the one-shot deepest-slab
    # fetch at s == 0); only the kp-1 slab streams from HBM each step.
    chi_first = chi_init_ref[0]
    is0 = (s == 0)
    chi = jnp.where(is0, chi_first, chic_s[...])
    chi_u = chi_u_ref[0]
    chi_d = jnp.where(is0, chi_first, chid_s[...])
    nx = chi.shape[1]

    col = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    at_e = lambda rolled, h: jnp.where(col == nx - 1, h, rolled)
    at_w = lambda rolled, h: jnp.where(col == 0, h, rolled)

    chi_e = at_e(pltpu.roll(chi, np.int32(nx - 1), 1), chie_ref[0])
    chi_w = at_w(pltpu.roll(chi, np.int32(1), 1), chiw_ref[0])
    chi_n = jnp.concatenate([chi[1:, :], chin_ref[0]], axis=0)
    chi_s = jnp.concatenate([chis_ref[0], chi[: ny - 1, :]], axis=0)

    up = lambda r: r[0].astype(chi.dtype)
    dcz = up(czu_ref) * (chi_u - chi) + up(czd_ref) * (chi - chi_d)
    dcx = up(cxe_ref) * (chi_e - chi) + up(cxw_ref) * (chi - chi_w)
    dcy = up(cyn_ref) * (chi_n - chi) + up(cys_ref) * (chi - chi_s)

    dcz_e = 0.5 * (dcz + at_e(pltpu.roll(dcz, np.int32(nx - 1), 1),
                              dcze_ref[0]))
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

    # Divergence of slab kp+1; its west/south flux shifts patch in the
    # exchanged boundary fluxes (streamed at index kp+1).
    @pl.when(s > 0)
    def _():
        fe_w = at_w(pltpu.roll(fe_prev, np.int32(1), 1), few_ref[0])
        fn_sh = jnp.concatenate([fns_ref[0], fn_prev[: ny - 1, :]], axis=0)
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
def _local_redi_pallas(op_local, chi, halos, interpret: bool):
    nz, ny_l, nx_l = chi.shape
    dtype = chi.dtype
    (chie_col, chiw_col, chin_row, chis_row,
     dcze_col, dczn_row, few_col, fns_row) = halos

    kp = lambda s: (jnp.clip(nz - 1 - s, 0, nz - 1), 0, 0)
    kp_up = lambda s: (jnp.clip(nz - 2 - s, 0, nz - 1), 0, 0)
    kp1 = lambda s: (jnp.clip(nz - s, 0, nz - 1), 0, 0)

    def spec(index_map, block=(1, ny_l, nx_l)):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    const2d = lambda s: (0, 0, 0)
    deepest = lambda s: (nz - 1, 0, 0)  # fetched once
    col_kp = spec(kp, (1, ny_l, 1))
    row_kp = spec(kp, (1, 1, nx_l))

    kernel = functools.partial(_redi_kernel_shard, ny=ny_l)
    f = lambda a: a if a.dtype == jnp.bfloat16 else a.astype(dtype)

    return pl.pallas_call(
        kernel,
        grid=(nz + 1,),
        in_specs=(
            [spec(deepest), spec(kp_up)]
            + [spec(kp)] * 10
            + [spec(kp1)] * 5
            + [spec(const2d), spec(const2d)]
            + [col_kp, col_kp, row_kp, row_kp]           # chi halos
            + [col_kp, row_kp]                           # dcz halos
            + [spec(kp1, (1, ny_l, 1)), spec(kp1, (1, 1, nx_l))]  # fluxes
        ),
        out_specs=spec(kp1),
        out_shape=jax.ShapeDtypeStruct((nz, ny_l, nx_l), dtype),
        scratch_shapes=[pltpu.VMEM((ny_l, nx_l), dtype)] * 7,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * nz * ny_l * nx_l,
            bytes_accessed=17 * nz * ny_l * nx_l * dtype.itemsize,
            transcendentals=0,
        ),
    )(
        chi, chi,
        f(op_local.ae), f(op_local.s_e), f(op_local.an), f(op_local.s_n),
        f(op_local.cz_u), f(op_local.cz_d), f(op_local.cx_e), f(op_local.cx_w),
        f(op_local.cy_n), f(op_local.cy_s),
        f(op_local.at), f(op_local.s_ti), f(op_local.s_tj), f(op_local.g_t),
        f(op_local.inv_v),
        f(op_local.inv_de).reshape(1, ny_l, nx_l),
        f(op_local.inv_dn).reshape(1, ny_l, nx_l),
        f(chie_col), f(chiw_col), f(chin_row), f(chis_row),
        f(dcze_col), f(dczn_row), f(few_col), f(fns_row),
    )


def _dcz_local(op_local, chi):
    """Cell-centered vertical derivative, k-local (no halo needed);
    identical clipping to the kernel's kp_up/kp1 index maps."""
    chi_up = jnp.concatenate([chi[:1], chi[:-1]], axis=0)
    chi_dn = jnp.concatenate([chi[1:], chi[-1:]], axis=0)
    return (op_local.cz_u * (chi_up - chi)
            + op_local.cz_d * (chi - chi_dn))


def redi_apply_halo_pallas(
    op: RediOperator,
    chi,
    mesh: Mesh,
    interpret: bool | None = None,
):
    """d(chi)/dt of Redi isoneutral diffusion over the device mesh:
    ppermute boundary-line exchanges + shard-local fused Pallas kernel.

    Exactly equals the single-chip `redi_apply_pallas` kernel result;
    inputs and output stay sharded P(None, 'y', 'x')."""
    if interpret is None:
        interpret = _default_interpret()
    topo = op.topology
    nx_dev = mesh.shape["x"]
    ny_dev = mesh.shape["y"]
    chi = jnp.asarray(chi)
    spec3 = P(None, "y", "x")

    op_specs = jax.tree_util.tree_map(lambda leaf: field_pspec(leaf.ndim), op)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(op_specs, spec3),
        out_specs=spec3,
        check_vma=False,
    )
    def _run(op_l, chi_l):
        chi_l = jnp.where(op_l.wet, chi_l, 0.0)

        # Round 1: chi halos (periodic x, open y, tripolar fold).
        chie_col, chiw_col, chin_row, chis_row = _halo_exchange(
            chi_l, topo, mesh
        )

        # Round 2: dcz boundary lines. East column from the east neighbor;
        # north row from the north neighbor (the seam fold is skipped: the
        # top shard's received zeros multiply s_n == 0).
        dcz = _dcz_local(op_l, chi_l)
        if nx_dev > 1:
            left = [(s, (s - 1) % nx_dev) for s in range(nx_dev)]
            dcze_col = jax.lax.ppermute(dcz[:, :, :1], "x", left)
        else:
            dcze_col = dcz[:, :, :1]
        if ny_dev > 1:
            down = [(s, s - 1) for s in range(1, ny_dev)]
            dczn_row = jax.lax.ppermute(dcz[:, :1, :], "y", down)
        else:
            dczn_row = jnp.zeros_like(dcz[:, :1, :])

        # Boundary fluxes for the divergence shifts — computed RECEIVER-
        # side, so no third dependent exchange round exists: my west-
        # interface flux is exactly the flux my west neighbor evaluates
        # at its east face, and every operand is either local or a
        # boundary line whose ppermute payload derives from LOCAL data
        # (chi/dcz lines, static coefficient lines). All exchanges in
        # this region therefore issue concurrently — one comm round per
        # apply instead of three serialized ones. Operand order matches
        # the sender-side expression exactly, so the result stays
        # bitwise identical to the single-chip kernel.
        if nx_dev > 1:
            right = [(s, (s + 1) % nx_dev) for s in range(nx_dev)]
            dczw_col = jax.lax.ppermute(dcz[:, :, -1:], "x", right)
            ae_w = jax.lax.ppermute(op_l.ae[:, :, -1:], "x", right)
            invde_w = jax.lax.ppermute(
                op_l.inv_de[None, :, -1:], "x", right
            )
            se_w = jax.lax.ppermute(op_l.s_e[:, :, -1:], "x", right)
        else:
            dczw_col = dcz[:, :, -1:]
            ae_w = op_l.ae[:, :, -1:]
            invde_w = op_l.inv_de[None, :, -1:]
            se_w = op_l.s_e[:, :, -1:]
        if ny_dev > 1:
            up_p = [(s, s + 1) for s in range(ny_dev - 1)]
            dczs_row = jax.lax.ppermute(dcz[:, -1:, :], "y", up_p)
            an_s = jax.lax.ppermute(op_l.an[:, -1:, :], "y", up_p)
            invdn_s = jax.lax.ppermute(
                op_l.inv_dn[None, -1:, :], "y", up_p
            )
            sn_s = jax.lax.ppermute(op_l.s_n[:, -1:, :], "y", up_p)
        else:
            dczs_row = jnp.zeros_like(dcz[:, -1:, :])
            an_s = jnp.zeros_like(op_l.an[:, -1:, :])
            invdn_s = jnp.zeros_like(op_l.inv_dn[None, -1:, :])
            sn_s = jnp.zeros_like(op_l.s_n[:, -1:, :])

        # sender-side: fe = ae*(inv_de*(chi_e - chi) + s_e*0.5*(dcz + dcz_e))
        # with, from my perspective: chi_e -> my first column, chi -> the
        # received chiw_col, dcz -> dczw_col, dcz_e -> my first dcz column.
        few_col = ae_w * (
            invde_w * (chi_l[:, :, :1] - chiw_col)
            + se_w * (0.5 * (dczw_col + dcz[:, :, :1]))
        )
        fns_row = an_s * (
            invdn_s * (chi_l[:, :1, :] - chis_row)
            + sn_s * (0.5 * (dczs_row + dcz[:, :1, :]))
        )

        halos = (chie_col, chiw_col, chin_row, chis_row,
                 dcze_col, dczn_row, few_col, fns_row)
        return _local_redi_pallas(op_l, chi_l, halos, interpret)

    return _run(op, chi)
