"""Multichip fused assembly: ppermute halo exchange + shard-local kernel.

`ops/assemble_pallas.py` builds the whole operator in one bottom-up
k-sweep on a single chip; GSPMD cannot auto-partition that custom call,
so without this module a sharded assembly drops back to the XLA pass
pipeline. Here the same kernel math runs *shard-locally* over the
('y', 'x') mesh: every cross-shard dependency of the assembly — the
west-face flux (the east neighbor's masked umo, velocities.jl:206-211),
the south-face flux (vmo of the row below, velocities.jl:219-224), the
wet factors of all four neighbors, the directed face areas entering the
min-face-area rule (matrixbuilding.jl:363-365), the tripolar-seam fold
partners (gridtopology.jl:94-95, matrixbuilding.jl:405-409), and the
density pair means in 3D-rho mode (matrixbuilding.jl:221-225) — is a
1-cell boundary line, exchanged with ONE `jax.lax.ppermute` per
direction (fields packed along a leading stack axis) plus one
mirror-shard ppermute for the fold. Inside the shard the domain is an
open box; the exchanged lines are streamed into the kernel as tiny side
inputs, exactly like the j-blocked single-chip variant streams its
block-halo rows.

Bit-exactness vs the single-chip kernel: every halo quantity is either a
0/1 wet factor (masking is exact in any multiplication order) or the
identical float value the single-chip kernel reads from the neighboring
rows/columns, so the sharded outputs equal the single-device
`assemble_T_pallas` outputs exactly (tested on the virtual CPU mesh).
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

from ..config import (
    KAPPA_H_DEFAULT,
    KAPPA_VDEEP_DEFAULT,
    KAPPA_VML_DEFAULT,
    RHO_DEFAULT,
)
from ..grid.geometry import GridMetrics
from ..ops.assemble_pallas import _default_interpret, _prep_kpack_residents
from ..ops.coeffs import StencilCoeffs


def _assembly_kernel_shard(
    *refs,
    nz: int,
    ny: int,
    rho: float,
    upwind: bool,
    rho3d: bool = False,
):
    """Shard-local assembly: `ops/assemble_pallas._assembly_kernel` with
    the periodic lane rolls / seam concats replaced by halo-patched
    shifts (boundary columns and rows arrive as exchanged side streams)."""
    if rho3d:
        (umo_ref, vmo_ref, v3d_ref, v3dup_ref, rho_ref, rhoup_ref,
         phis_ref, wetn_ref, wets_ref, psn_ref, pns_ref, seam_ref,
         rhon_ref, rhos_ref,
         phiw_ref, wete_ref, wetw_ref, pwe_ref, pew_ref,
         rhoe_ref, rhow_ref,
         kpack_ref,
         ele_ref, elw_ref, eln_ref, els_ref,
         khde_ref, khdw_ref, khdn_ref, khds_ref,
         areac_ref, inva_ref, ml_ref, seamw_ref,
         diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
         carry_scr, prevwet_scr, prevrho_scr) = refs
    else:
        (umo_ref, vmo_ref, v3d_ref, v3dup_ref,
         phis_ref, wetn_ref, wets_ref, psn_ref, pns_ref, seam_ref,
         phiw_ref, wete_ref, wetw_ref, pwe_ref, pew_ref,
         kpack_ref,
         ele_ref, elw_ref, eln_ref, els_ref,
         khde_ref, khdw_ref, khdn_ref, khds_ref,
         areac_ref, inva_ref, ml_ref, seamw_ref,
         diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
         carry_scr, prevwet_scr) = refs

    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        carry_scr[...] = jnp.zeros_like(carry_scr)
        prevwet_scr[...] = jnp.zeros_like(prevwet_scr)
        if rho3d:
            prevrho_scr[...] = jnp.zeros_like(prevrho_scr)

    @pl.when(s > 0)
    def _():
        k = nz - s  # bottom-up sweep
        v = v3d_ref[0]
        dtype = v.dtype
        nx = v.shape[1]
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)

        col = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        at_e = lambda rolled, h: jnp.where(col == nx - 1, h, rolled)
        at_w = lambda rolled, h: jnp.where(col == 0, h, rolled)

        wet = v == v
        wetf = jnp.where(wet, one, zero)
        vu = v3dup_ref[0]
        wetuf = jnp.where(vu == vu, one, zero)
        vclean = jnp.where(wet, v, one)
        inv_v = wetf / vclean

        if upwind:
            pos = lambda x: jnp.maximum(x, zero)
            neg = lambda x: -jnp.minimum(x, zero)
        else:
            pos = lambda x: x * 0.5
            neg = lambda x: x * -0.5

        # --- face fluxes with halo-patched shifts -----------------------
        sanitize = lambda x: jnp.where(x == x, x, zero)
        wetf_e = at_e(pltpu.roll(wetf, nx - 1, 1), wete_ref[0])
        wetf_n = jnp.concatenate([wetf[1:, :], wetn_ref[0]], axis=0)
        mask_e = wetf * wetf_e
        mask_n = wetf * wetf_n
        phi_e = sanitize(umo_ref[0]) * mask_e
        phi_n = sanitize(vmo_ref[0]) * mask_n

        phi_w = at_w(pltpu.roll(phi_e, 1, 1), phiw_ref[0])
        phi_s = jnp.concatenate([phis_ref[0], phi_n[: ny - 1, :]], axis=0)

        phi_b = carry_scr[...]
        phi_t = phi_b + (phi_w + phi_s - phi_e - phi_n)
        carry_scr[...] = phi_t

        not_surf = jnp.where(k > 0, one, zero)

        # --- advection legs ---------------------------------------------
        in_e, in_w = neg(phi_e), pos(phi_w)
        in_n, in_s = neg(phi_n), pos(phi_s)
        in_b = pos(phi_b)
        in_t = not_surf * neg(phi_t)

        # Local top row: the seam replacement (folded partner's own "From
        # North" branch) applies only on the global-top tripolar shard,
        # selected by the resident seam weight.
        on = pos(phi_n)
        sw = seamw_ref[0, :]
        last_row = sw * seam_ref[0] + (one - sw) * on[ny - 1 :, :]
        out_n = jnp.concatenate([on[: ny - 1, :], last_row], axis=0)

        if rho3d:
            half = dtype.type(0.5)
            rho_c = rho_ref[0]
            pair_e = (rho_c + at_e(pltpu.roll(rho_c, nx - 1, 1), rhoe_ref[0])) * half
            pair_w = (rho_c + at_w(pltpu.roll(rho_c, 1, 1), rhow_ref[0])) * half
            rho_n = jnp.concatenate([rho_c[1:, :], rhon_ref[0]], axis=0)
            pair_n = (rho_c + rho_n) * half
            rho_s = jnp.concatenate([rhos_ref[0], rho_c[: ny - 1, :]], axis=0)
            pair_s = (rho_c + rho_s) * half
            pair_t = (rho_c + rhoup_ref[0]) * half
            pair_b = (rho_c + prevrho_scr[...]) * half
            prevrho_scr[...] = rho_c
            im_e, im_w = inv_v / pair_e, inv_v / pair_w
            im_n, im_s = inv_v / pair_n, inv_v / pair_s
            im_t, im_b = inv_v / pair_t, inv_v / pair_b
            adv_diag = (
                pos(phi_e) * im_e + neg(phi_w) * im_w + neg(phi_s) * im_s
                + out_n * im_n + neg(phi_b) * im_b
                + not_surf * pos(phi_t) * im_t
            )
        else:
            inv_m = inv_v * dtype.type(1.0 / rho)
            im_e = im_w = im_n = im_s = im_t = im_b = inv_m
            out_sum = (
                pos(phi_e) + neg(phi_w) + neg(phi_s) + out_n
                + neg(phi_b) + not_surf * pos(phi_t)
            )
            adv_diag = out_sum * inv_m

        # --- horizontal diffusion (min-face-area rule) --------------------
        thk = vclean * inva_ref[...]
        p_e = thk * ele_ref[...]
        p_w = thk * elw_ref[...]
        p_n = thk * eln_ref[...]
        p_s = thk * els_ref[...]

        wetf_w = at_w(pltpu.roll(wetf, 1, 1), wetw_ref[0])
        wetf_s = jnp.concatenate([wets_ref[0], wetf[: ny - 1, :]], axis=0)

        tv_e = jnp.minimum(p_e, at_e(pltpu.roll(p_w, nx - 1, 1), pwe_ref[0])) \
            * khde_ref[...] * inv_v * mask_e
        tv_w = jnp.minimum(p_w, at_w(pltpu.roll(p_e, 1, 1), pew_ref[0])) \
            * khdw_ref[...] * inv_v * (wetf * wetf_w)
        a_nb_n = jnp.concatenate([p_s[1:, :], psn_ref[0]], axis=0)
        tv_n = jnp.minimum(p_n, a_nb_n) * khdn_ref[...] * inv_v * mask_n
        a_nb_s = jnp.concatenate([pns_ref[0], p_n[: ny - 1, :]], axis=0)
        tv_s = jnp.minimum(p_s, a_nb_s) * khds_ref[...] * inv_v * (wetf * wetf_s)

        # --- vertical diffusion -------------------------------------------
        r = kpack_ref[0]
        zup_max, zdn_max = r[0:1, :], r[1:2, :]
        au_deep, au_ml = r[2:3, :], r[3:4, :]
        ad_deep, ad_ml = r[4:5, :], r[5:6, :]

        ml = ml_ref[...]
        om_up = jnp.where(zup_max < ml, one, zero)
        om_dn = jnp.where(zdn_max < ml, one, zero)
        a_over_v = areac_ref[...] * inv_v
        prev_wet = prevwet_scr[...]
        tot_up = a_over_v * (au_deep + au_ml * om_up) * (wetf * wetuf)
        tot_dn = a_over_v * (ad_deep + ad_ml * om_dn) * (wetf * prev_wet)
        prevwet_scr[...] = wetf

        diag_ref[0] = adv_diag + tv_e + tv_w + tv_n + tv_s + tot_up + tot_dn
        e_ref[0] = -(in_e * im_e) - tv_e
        w_ref[0] = -(in_w * im_w) - tv_w
        n_ref[0] = -(in_n * im_n) - tv_n
        s_ref[0] = -(in_s * im_s) - tv_s
        t_ref[0] = -(in_t * im_t) - tot_up
        b_ref[0] = -(in_b * im_b) - tot_dn


@functools.partial(
    jax.jit, static_argnames=("nz", "rho", "upwind", "rho3d", "interpret")
)
def _local_assembly_pallas(
    umo, vmo, v3d, kpack, residents, rows, cols, seamw, rho_pack,
    nz: int, rho: float, upwind: bool, rho3d: bool, interpret: bool,
):
    ny_l, nx_l = umo.shape[1:]
    dtype = umo.dtype

    k_of = lambda s: jnp.minimum(nz - s, nz - 1)
    slab = lambda s: (k_of(s), 0, 0)
    slab_up = lambda s: (jnp.clip(nz - s - 1, 0, nz - 1), 0, 0)
    flat2d = lambda s: (0, 0)

    def spec(index_map, block=(1, ny_l, nx_l)):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    spec2d = pl.BlockSpec((ny_l, nx_l), index_map_i32(flat2d), memory_space=pltpu.VMEM)
    spec_row = spec(slab, (1, 1, nx_l))
    spec_col = spec(slab, (1, ny_l, 1))

    kernel = functools.partial(
        _assembly_kernel_shard,
        nz=nz, ny=ny_l, rho=float(rho), upwind=upwind, rho3d=rho3d,
    )

    scratch = [pltpu.VMEM((ny_l, nx_l), dtype), pltpu.VMEM((ny_l, nx_l), dtype)]
    if rho3d:
        rho_c, rhon_row, rhos_row, rhoe_col, rhow_col = rho_pack
        rho_inputs = (rho_c, rho_c, rhon_row, rhos_row)
        rho_specs = [spec(slab), spec(slab_up)]
        rho_row_specs = [spec_row] * 2
        rho_col_inputs = (rhoe_col, rhow_col)
        rho_col_specs = [spec_col] * 2
        scratch.append(pltpu.VMEM((ny_l, nx_l), dtype))
    else:
        rho_inputs = rho_col_inputs = ()
        rho_specs = rho_row_specs = rho_col_specs = []
    # rho slabs precede the rows in the kernel signature
    rho_slab_inputs, rho_row_inputs = rho_inputs[:2], rho_inputs[2:]

    phis_row, wetn_row, wets_row, psn_row, pns_row, seam_row = rows
    phiw_col, wete_col, wetw_col, pwe_col, pew_col = cols

    out = pl.pallas_call(
        kernel,
        grid=(nz + 1,),
        in_specs=[spec(slab)] * 3
        + [spec(slab_up)]
        + rho_specs
        + [spec_row] * 6
        + rho_row_specs
        + [spec_col] * 5
        + rho_col_specs
        + [spec(slab, (1, 8, nx_l))]
        + [spec2d] * 11
        + [pl.BlockSpec((1, nx_l), index_map_i32(flat2d), memory_space=pltpu.VMEM)],
        out_specs=[spec(slab)] * 7,
        out_shape=[jax.ShapeDtypeStruct((nz, ny_l, nx_l), dtype)] * 7,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(
        umo, vmo, v3d, v3d,
        *rho_slab_inputs,
        phis_row, wetn_row, wets_row, psn_row, pns_row, seam_row,
        *rho_row_inputs,
        phiw_col, wete_col, wetw_col, pwe_col, pew_col,
        *rho_col_inputs,
        kpack,
        *residents,
        seamw,
    )
    return StencilCoeffs(*out)


def _exchange_lines(mesh: Mesh, payload_e, payload_w, payload_n, payload_s):
    """One ppermute per direction over packed boundary lines.

    payload_e/w: (F, nz, ny_l, 1) stacks sent east/west (periodic x);
    payload_n/s: (F, nz, 1, nx_l) stacks sent north/south (no wrap in y,
    missing senders produce zeros — the reference's no-neighbor rows).
    Returns (west_halo, east_halo, south_halo, north_halo) as received.
    """
    nx_dev = mesh.shape["x"]
    ny_dev = mesh.shape["y"]

    if nx_dev > 1:
        right = [(s, (s + 1) % nx_dev) for s in range(nx_dev)]
        left = [(s, (s - 1) % nx_dev) for s in range(nx_dev)]
        west_h = jax.lax.ppermute(payload_e, "x", right)  # from my west nb
        east_h = jax.lax.ppermute(payload_w, "x", left)  # from my east nb
    else:
        west_h, east_h = payload_e, payload_w  # periodic self-wrap

    if ny_dev > 1:
        up = [(s, s + 1) for s in range(ny_dev - 1)]
        down = [(s, s - 1) for s in range(1, ny_dev)]
        south_h = jax.lax.ppermute(payload_n, "y", up)  # from my south nb
        north_h = jax.lax.ppermute(payload_s, "y", down)  # from my north nb
    else:
        south_h = jnp.zeros_like(payload_n)
        north_h = jnp.zeros_like(payload_s)

    return west_h, east_h, south_h, north_h


def _mirror_exchange(mesh: Mesh, payload):
    """Tripolar fold: exchange with the mirror shard over 'x'
    (gridtopology.jl:94-95). Payload rows are pre-reversed, so the
    received stack is the fold halo in local orientation."""
    nx_dev = mesh.shape["x"]
    if nx_dev == 1:
        return payload
    mirror = [(s, nx_dev - 1 - s) for s in range(nx_dev)]
    return jax.lax.ppermute(payload, "x", mirror)


def assemble_T_halo_pallas(
    umo,
    vmo,
    mlotst,
    gridmetrics: GridMetrics,
    mesh: Mesh,
    wet3d=None,
    rho=RHO_DEFAULT,
    kappa_h=KAPPA_H_DEFAULT,
    kappa_vml=KAPPA_VML_DEFAULT,
    kappa_vdeep=KAPPA_VDEEP_DEFAULT,
    upwind: bool = True,
    interpret: bool | None = None,
) -> StencilCoeffs:
    """Total operator T as mesh-sharded stencil coefficients, assembled
    shard-locally by the fused Pallas kernel (scalar or 3D rho).

    Exactly equals the single-chip `assemble_T_pallas` / the XLA pipeline
    `assemble_transport(...).T` (physics: matrixbuilding.jl:128-150); the
    outputs stay sharded P(None, 'y', 'x') and feed
    `apply_stencil_halo_pallas` without resharding.
    """
    topo = gridmetrics.topology
    if topo.kind == "unknown":
        raise ValueError("assemble_T_halo_pallas requires a known topology")
    nz, ny, nx = topo.shape3d
    if interpret is None:
        interpret = _default_interpret()

    v3dw = gridmetrics.v3d
    if wet3d is not None:
        v3dw = jnp.where(jnp.asarray(wet3d, bool), v3dw, jnp.nan)
    dtype = jnp.asarray(v3dw).dtype
    f = lambda x: jnp.asarray(x, dtype)
    umo, vmo, v3dw = f(umo), f(vmo), f(v3dw)

    rho3d_arr = None
    if jnp.ndim(rho) == 3:
        from ..ops.assemble_pallas import _check_rho_wet

        rho3d_arr, rho = rho, 0.0
        _check_rho_wet(rho3d_arr, v3dw)
        rho3d_arr = jnp.where(
            jnp.isfinite(f(rho3d_arr)), f(rho3d_arr), dtype.type(1.0)
        )
    rho3d = rho3d_arr is not None

    # Global prep: per-level packed scalars + resident 2D fields — all
    # elementwise, so GSPMD shards them over the mesh for free.
    kpack, residents = _prep_kpack_residents(
        f(mlotst), gridmetrics.area2d, gridmetrics.edge_length,
        gridmetrics.distance_to_neighbour, gridmetrics.zt, dtype,
        float(kappa_h), float(kappa_vml), float(kappa_vdeep), nz, nx,
    )

    spec3 = P(None, "y", "x")
    spec2 = P("y", "x")
    res_specs = tuple(spec2 for _ in residents)
    rho_spec = (spec3,) if rho3d else ()
    rho_args = (rho3d_arr,) if rho3d else ()
    is_tripolar = topo.is_tripolar
    upwind = bool(upwind)
    ny_dev = mesh.shape["y"]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec3, spec3, spec3, P(None, None, "x"), res_specs) + rho_spec,
        out_specs=jax.tree_util.tree_map(
            lambda _: spec3, StencilCoeffs(*([0] * 7))
        ),
        check_vma=False,
    )
    def _run(umo_l, vmo_l, v3d_l, kpack_l, res_l, *rho_l):
        ny_l, nx_l = v3d_l.shape[1:]
        (ele, elw, eln, els, _khde, _khdw, _khdn, _khds,
         _areac, inva, _ml) = res_l
        one = dtype.type(1)
        zero = dtype.type(0)

        wetf = jnp.where(v3d_l == v3d_l, one, zero)
        vclean = jnp.where(v3d_l == v3d_l, v3d_l, one)
        thk = vclean * inva[None]
        san = lambda x: jnp.where(x == x, x, zero)

        # Boundary-line payloads, packed one stack per direction.
        # Sent east (→ neighbor's west halo): wet, masked umo, p_e[, rho]
        pe_line = thk[:, :, -1:] * ele[None, :, -1:]
        pay_e = [wetf[:, :, -1:], san(umo_l[:, :, -1:]) * wetf[:, :, -1:],
                 pe_line]
        # Sent west (→ neighbor's east halo): wet, p_w[, rho]
        pw_line = thk[:, :, :1] * elw[None, :, :1]
        pay_w = [wetf[:, :, :1], pw_line]
        # Sent north (→ neighbor's south halo): wet, masked vmo, p_n[, rho]
        pn_line = thk[:, -1:, :] * eln[None, -1:, :]
        pay_n = [wetf[:, -1:, :], san(vmo_l[:, -1:, :]) * wetf[:, -1:, :],
                 pn_line]
        # Sent south (→ neighbor's north halo): wet, p_s[, rho]
        ps_line = thk[:, :1, :] * els[None, :1, :]
        pay_s = [wetf[:, :1, :], ps_line]
        if rho3d:
            (rho_loc,) = rho_l
            pay_e.append(rho_loc[:, :, -1:])
            pay_w.append(rho_loc[:, :, :1])
            pay_n.append(rho_loc[:, -1:, :])
            pay_s.append(rho_loc[:, :1, :])

        west_h, east_h, south_h, north_h = _exchange_lines(
            mesh, jnp.stack(pay_e), jnp.stack(pay_w),
            jnp.stack(pay_n), jnp.stack(pay_s),
        )

        wetw_col, phiw_raw, pew_col = west_h[0], west_h[1], west_h[2]
        wete_col, pwe_col = east_h[0], east_h[1]
        wets_row, phis_raw, pns_row = south_h[0], south_h[1], south_h[2]
        wetn_row, psn_row = north_h[0], north_h[1]
        # Complete the two-sided masks with the local wet factor (exact:
        # wet factors are 0/1).
        phiw_col = phiw_raw * wetf[:, :, :1]
        phis_row = phis_raw * wetf[:, :1, :]

        seam_row = jnp.zeros((nz, 1, nx_l), dtype)
        seamw = jnp.zeros((1, nx_l), dtype)
        if rho3d:
            rhow_col, rhoe_col = west_h[3], east_h[2]
            rhos_row, rhon_row = south_h[3], north_h[2]

        if is_tripolar:
            # Mirror-shard fold exchange of the pre-reversed top-row
            # lines: wet, masked vmo, p_n (the oppdir==north face area,
            # matrixbuilding.jl:405-409)[, rho].
            fold_pay = [wetf[:, -1:, ::-1],
                        san(vmo_l[:, -1:, ::-1]) * wetf[:, -1:, ::-1],
                        pn_line[:, :, ::-1]]
            if rho3d:
                fold_pay.append(rho_loc[:, -1:, ::-1])
            fold = _mirror_exchange(mesh, jnp.stack(fold_pay))
            is_top = (jax.lax.axis_index("y") == ny_dev - 1).astype(dtype)

            wetn_row = is_top * fold[0] + (one - is_top) * wetn_row
            psn_row = is_top * fold[2] + (one - is_top) * psn_row
            if upwind:
                negf = lambda x: -jnp.minimum(x, zero)
            else:
                negf = lambda x: x * dtype.type(-0.5)
            seam_row = is_top * negf(fold[1] * wetf[:, -1:, :])
            seamw = jnp.full((1, nx_l), is_top, dtype)
            if rho3d:
                # Fold partner of dry cells is cleaned to 1 outside; a dry
                # partner row received as 0 never occurs (rho_loc is
                # finite everywhere), so the pair mean is always positive.
                rhon_row = is_top * fold[3] + (one - is_top) * rhon_row

        rows = (phis_row, wetn_row, wets_row, psn_row, pns_row, seam_row)
        cols = (phiw_col, wete_col, wetw_col, pwe_col, pew_col)
        if rho3d:
            # Zero-filled no-neighbor density lines would make the pair
            # mean rho/2 — positive and only multiplied by exactly-zero
            # fluxes, but we patch with the local line to match the
            # single-chip kernel's self-pairing at closed boundaries.
            rhos_row = jnp.where(wets_row > 0, rhos_row, rho_loc[:, :1, :])
            rhon_row = jnp.where(wetn_row > 0, rhon_row, rho_loc[:, -1:, :])
            rho_pack = (rho_loc, rhon_row, rhos_row, rhoe_col, rhow_col)
        else:
            rho_pack = None

        return _local_assembly_pallas(
            umo_l, vmo_l, v3d_l, kpack_l, res_l, rows, cols, seamw, rho_pack,
            nz, float(rho), upwind, rho3d, interpret,
        )

    return _run(umo, vmo, v3dw, kpack, residents, *rho_args)
