"""Fused Pallas TPU kernel for whole-operator assembly.

Builds the seven stencil legs of T = Tadv + TkH + TkVML + TkVdeep directly
from raw transports in ONE bottom-up k-sweep, instead of the ~dozen fused
XLA passes of `assemble_transport` (models/transport.py). Per k level the
kernel

  * sanitizes and no-flux-masks umo/vmo, derives west/south faces by lane
    roll / sublane shift (reference velocities.jl:190-224);
  * closes the vertical fluxes by mass conservation, carrying the suffix
    sum  phi_top[k] = sum_{k' >= k} (W+S-E-N)[k']  in a VMEM scratch slab
    (the reference's sequential k-sweep, velocities.jl:236-243 — here it
    rides along the kernel's k-grid for free);
  * forms the upwind/centered advection legs incl. the donor-side
    diagonal and the tripolar-seam north outflux
    (matrixbuilding.jl:226-299, see ops/coeffs.py for the cell-local
    re-derivation);
  * adds horizontal diffusion with the min-face-area rule and the
    seam's oppdir==north case (matrixbuilding.jl:337-418);
  * adds mixed-layer + deep vertical diffusion (matrixbuilding.jl:438-479)
    from per-level 1/dz rows packed outside the kernel.

HBM traffic: 4 input slabs (umo, vmo, v3d at k and k-1) + 7 output slabs
per cell, plus O(ny*nx) resident 2D metric fields fetched once (constant
block index) — ~2x less than the XLA pass pipeline, which must
materialize the log-depth cumsum of the vertical closure.

Cross-seam / i-reversed rows (Mosaic has no in-kernel lane reversal) are
precomputed outside and streamed as (nz, 1, nx) side inputs, as in
ops/stencil_pallas.py.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import index_map_i32

from ..config import (
    KAPPA_H_DEFAULT,
    KAPPA_VDEEP_DEFAULT,
    KAPPA_VML_DEFAULT,
    RHO_DEFAULT,
)
from ..grid.geometry import GridMetrics
from ..grid.topology import GridTopology
from .coeffs import StencilCoeffs

logger = logging.getLogger(__name__)

_VMEM_BUDGET = 100 * 1024 * 1024


def _assembly_kernel(
    *refs,
    nz: int,
    ny: int,
    rho: float,
    upwind: bool,
    rho3d: bool = False,
):
    if rho3d:
        # rho streamed as k / k-1 slabs + the folded seam row; the k+1
        # slab rides the bottom-up sweep in a scratch (like the flux carry)
        (umo_ref, vmo_ref, v3d_ref, v3dup_ref, rho_ref, rhoup_ref,
         advseam_ref, wetseam_ref, ahnseam_ref, rhoseam_ref,
         kpack_ref,
         ele_ref, elw_ref, eln_ref, els_ref,
         khde_ref, khdw_ref, khdn_ref, khds_ref,
         areac_ref, inva_ref, ml_ref,
         diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
         carry_scr, prevwet_scr, prevrho_scr) = refs
    else:
        (umo_ref, vmo_ref, v3d_ref, v3dup_ref,
         advseam_ref, wetseam_ref, ahnseam_ref,
         kpack_ref,
         ele_ref, elw_ref, eln_ref, els_ref,
         khde_ref, khdw_ref, khdn_ref, khds_ref,
         areac_ref, inva_ref, ml_ref,
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
        k = nz - s  # bottom-up sweep: step 1 handles the seafloor level
        v = v3d_ref[0]
        dtype = v.dtype
        nx = v.shape[1]
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)

        # All masking is MULTIPLICATIVE on guaranteed-finite operands (one
        # divide and a handful of selects per cell — the kernel is
        # otherwise compute-bound, not bandwidth-bound): land volumes are
        # NaN by convention, so v is first replaced by 1 on land and the
        # 0/1 wet factor carries the mask.
        wet = v == v  # finite(v3d) — land is NaN by convention
        wetf = jnp.where(wet, one, zero)
        vu = v3dup_ref[0]
        wetuf = jnp.where(vu == vu, one, zero)
        vclean = jnp.where(wet, v, one)
        inv_v = wetf / vclean  # exact 0 on land; the kernel's only divide

        if upwind:
            pos = lambda x: jnp.maximum(x, zero)
            neg = lambda x: -jnp.minimum(x, zero)
        else:
            pos = lambda x: x * 0.5
            neg = lambda x: x * -0.5

        # --- face fluxes (velocities.jl:190-243) -----------------------
        sanitize = lambda x: jnp.where(x == x, x, zero)
        wetf_e = pltpu.roll(wetf, nx - 1, 1)  # wet at i+1
        wetf_n = jnp.concatenate([wetf[1:, :], wetseam_ref[0]], axis=0)
        mask_e = wetf * wetf_e
        mask_n = wetf * wetf_n
        phi_e = sanitize(umo_ref[0]) * mask_e
        phi_n = sanitize(vmo_ref[0]) * mask_n

        phi_w = pltpu.roll(phi_e, 1, 1)  # east flux of the i-1 neighbor
        phi_s = jnp.concatenate(
            [jnp.zeros((1, nx), dtype), phi_n[: ny - 1, :]], axis=0
        )

        phi_b = carry_scr[...]  # phi_top[k+1]; zero at the seafloor
        phi_t = phi_b + (phi_w + phi_s - phi_e - phi_n)
        carry_scr[...] = phi_t

        # Surface top face skipped (evaporation/precipitation,
        # matrixbuilding.jl:290).
        not_surf = jnp.where(k > 0, one, zero)

        # --- advection legs (matrixbuilding.jl:226-299) ------------------
        in_e, in_w = neg(phi_e), pos(phi_w)
        in_n, in_s = neg(phi_n), pos(phi_s)
        in_b = pos(phi_b)
        in_t = not_surf * neg(phi_t)

        out_n = jnp.concatenate(
            [pos(phi_n)[: ny - 1, :], advseam_ref[0]], axis=0
        )

        if rho3d:
            # Per-face masses m = mean(rho_c, rho_nb) * v
            # (matrixbuilding.jl:193-195, 221-225): rho arrives pre-cleaned
            # (finite everywhere), the seam row is the fold partner, and
            # masked faces carry exactly-zero fluxes so boundary pair
            # values are inert.
            half = dtype.type(0.5)
            rho_c = rho_ref[0]
            pair_e = (rho_c + pltpu.roll(rho_c, nx - 1, 1)) * half
            pair_w = (rho_c + pltpu.roll(rho_c, 1, 1)) * half
            rho_n = jnp.concatenate([rho_c[1:, :], rhoseam_ref[0]], axis=0)
            pair_n = (rho_c + rho_n) * half
            rho_s = jnp.concatenate([rho_c[:1, :], rho_c[: ny - 1, :]], axis=0)
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

        # --- horizontal diffusion (matrixbuilding.jl:337-418) ------------
        # tval_d = kappa_h * min(a_own, a_nb) / (dist * V); kappa_h/dist is
        # the precomputed khd (0 where no neighbor), thickness uses the
        # land-cleaned volume so every operand is finite and the wet-pair
        # product carries the mask.
        thk = vclean * inva_ref[...]
        p_e = thk * ele_ref[...]
        p_w = thk * elw_ref[...]
        p_n = thk * eln_ref[...]
        p_s = thk * els_ref[...]

        wetf_w = pltpu.roll(wetf, 1, 1)
        wetf_s = jnp.concatenate([jnp.zeros((1, nx), dtype), wetf[: ny - 1, :]], axis=0)

        tv_e = jnp.minimum(p_e, pltpu.roll(p_w, nx - 1, 1)) * khde_ref[...] \
            * inv_v * mask_e
        tv_w = jnp.minimum(p_w, pltpu.roll(p_e, 1, 1)) * khdw_ref[...] \
            * inv_v * (wetf * wetf_w)
        a_nb_n = jnp.concatenate([p_s[1:, :], ahnseam_ref[0]], axis=0)
        tv_n = jnp.minimum(p_n, a_nb_n) * khdn_ref[...] * inv_v * mask_n
        a_nb_s = jnp.concatenate([p_n[:1, :], p_n[: ny - 1, :]], axis=0)
        tv_s = jnp.minimum(p_s, a_nb_s) * khds_ref[...] * inv_v * (wetf * wetf_s)

        # --- vertical diffusion (matrixbuilding.jl:438-479) --------------
        r = kpack_ref[0]  # (8, nx): rows broadcast over j
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

        # --- total legs ---------------------------------------------------
        diag_ref[0] = adv_diag + tv_e + tv_w + tv_n + tv_s + tot_up + tot_dn
        e_ref[0] = -(in_e * im_e) - tv_e
        w_ref[0] = -(in_w * im_w) - tv_w
        n_ref[0] = -(in_n * im_n) - tv_n
        s_ref[0] = -(in_s * im_s) - tv_s
        t_ref[0] = -(in_t * im_t) - tot_up
        b_ref[0] = -(in_b * im_b) - tot_dn


def _prep_rho(rho, dtype, topology: GridTopology):
    """Clean a 3D density field for in-kernel streaming: finite
    everywhere (land NaN -> 1; inert because masked faces carry zero
    fluxes), plus the folded top-row seam partner (tripolar) for the
    north pair mean (gridtopology.jl:94-95)."""
    nz, ny, nx = topology.shape3d
    rho = jnp.asarray(rho, dtype)
    rho_c = jnp.where(rho == rho, rho, dtype.type(1.0))
    if topology.is_tripolar:
        seam = rho_c[:, -1, ::-1].reshape(nz, 1, nx)
    else:
        seam = jnp.ones((nz, 1, nx), dtype)  # bipolar top row: no-flux
    return rho_c, seam


def _check_rho_wet(rho3d_arr, v3dw):
    """Error on NaN density at wet cells, mirroring the reference's
    `any(isnan, ρ[wet3D]) && error("ρ contains NaNs")`
    (matrixbuilding.jl:233): a NaN rho would otherwise be cleaned to 1 by
    `_prep_rho` and silently corrupt the face masses (~1000x off).
    Host-side eager check, skipped when tracing (same contract as
    models/transport._checked)."""
    import numpy as np

    if isinstance(jnp.asarray(rho3d_arr), jax.core.Tracer) or isinstance(
        jnp.asarray(v3dw), jax.core.Tracer
    ):
        return
    wet = np.isfinite(np.asarray(v3dw))
    if np.isnan(np.asarray(rho3d_arr)[wet]).any():
        raise FloatingPointError(
            "rho contains NaNs on wet cells (reference matrixbuilding.jl:233)"
        )


def _prep_streams(
    umo, vmo, mlotst, v3dw, area2d, edge_length, distance_to_neighbour, zt,
    topology: GridTopology,
    kappa_h: float, kappa_vml: float, kappa_vdeep: float, upwind: bool,
):
    """Side streams shared by the full-slab and j-blocked variants:
    seam rows, per-level packed scalars, and finite resident 2D fields."""
    nz, ny, nx = topology.shape3d
    dtype = jnp.asarray(v3dw).dtype
    f = lambda x: jnp.asarray(x, dtype)
    umo, vmo, v3dw = f(umo), f(vmo), f(v3dw)
    area2d, ml = f(area2d), f(mlotst)

    wetf = jnp.where(v3dw == v3dw, dtype.type(1), dtype.type(0))

    if upwind:
        negf = lambda x: -jnp.minimum(x, 0.0)
    else:
        negf = lambda x: -x / 2

    # North-outflux seam row (see coeffs._advection_north_outflux): the
    # folded neighbor's own "From North" branch. Zero for bipolar (top-row
    # phi_north is no-flux there).
    if topology.is_tripolar:
        wet_top = wetf[:, -1, :]
        nb_top = wet_top[:, ::-1]
        pn_top = jnp.where(
            (wet_top > 0) & (nb_top > 0),
            jnp.where(vmo[:, -1, :] == vmo[:, -1, :], vmo[:, -1, :], 0.0),
            0.0,
        )
        adv_seam = negf(pn_top[:, ::-1])
        wet_seam = nb_top
        # Same expression as the kernel-internal p_n (thk * eln with
        # thk = vclean * inva) and the sharded fold payload
        # (parallel/assemble_halo.py pn_line), so the min(p_n, a_nb_n)
        # comparison at the seam is BITWISE identical across the
        # single-chip and sharded paths (x*(1/a) vs x/a differ by 1 ulp).
        # Dry folded cells (vclean=1) are masked by the wet pair.
        vclean_top = jnp.where(wet_top > 0, v3dw[:, -1, :], dtype.type(1))
        inva_top = jnp.where(
            jnp.isfinite(area2d[-1, :]), 1.0 / area2d[-1, :], 0.0
        ).astype(dtype)
        ahn_seam = (
            (vclean_top * inva_top) * f(edge_length["north"])[-1, :]
        )[:, ::-1]
    else:
        adv_seam = jnp.zeros((nz, nx), dtype)
        wet_seam = jnp.zeros((nz, nx), dtype)
        ahn_seam = jnp.zeros((nz, nx), dtype)
    adv_seam = adv_seam.reshape(nz, 1, nx)
    wet_seam = wet_seam.reshape(nz, 1, nx)
    ahn_seam = ahn_seam.reshape(nz, 1, nx)

    kpack, residents = _prep_kpack_residents(
        ml, area2d, edge_length, distance_to_neighbour, zt, dtype,
        kappa_h, kappa_vml, kappa_vdeep, nz, nx,
    )
    return umo, vmo, v3dw, adv_seam, wet_seam, ahn_seam, kpack, residents


def _prep_kpack_residents(
    ml, area2d, edge_length, distance_to_neighbour, zt, dtype,
    kappa_h: float, kappa_vml: float, kappa_vdeep: float, nz: int, nx: int,
):
    """Per-level packed scalars and finite resident 2D fields — purely
    elementwise (no seam/reversal), so they shard trivially over a device
    mesh (reused by parallel/assemble_halo.py)."""
    f = lambda x: jnp.asarray(x, dtype)
    area2d = f(area2d)

    # Per-level packed scalars: max-z of the k/k-1 and k/k+1 pairs (for the
    # mixed-layer mask: zt[k]<ml AND zt[k']<ml <=> max<ml) and kappa/dz
    # rows, zeroed at the boundaries where no vertical neighbor exists.
    zt = jnp.asarray(zt, dtype)
    inf = jnp.asarray(jnp.inf, dtype)
    z_up = jnp.concatenate([zt[:1], zt[:-1]])
    z_dn = jnp.concatenate([zt[1:], zt[-1:]])
    dz_up = jnp.abs(zt - z_up).at[0].set(jnp.inf)
    dz_dn = jnp.abs(zt - z_dn).at[-1].set(jnp.inf)
    zup_max = jnp.maximum(zt, z_up).at[0].set(inf)
    zdn_max = jnp.maximum(zt, z_dn).at[-1].set(inf)
    kpack = jnp.stack(
        [
            zup_max,
            zdn_max,
            kappa_vdeep / dz_up,
            kappa_vml / dz_up,
            kappa_vdeep / dz_dn,
            kappa_vml / dz_dn,
            jnp.zeros_like(zt),
            jnp.zeros_like(zt),
        ],
        axis=1,
    )  # (nz, 8)
    kpack = jnp.broadcast_to(kpack[:, :, None], (nz, 8, nx)).astype(dtype)

    # Resident 2D fields, all finite: kappa_h/dist (0 where no neighbor),
    # cleaned area and 1/area (0 where NaN — all-land columns).
    def khd(d):
        dist = f(distance_to_neighbour[d])
        return jnp.where(jnp.isfinite(dist), dtype.type(kappa_h) / dist, 0.0)

    residents = (
        f(edge_length["east"]), f(edge_length["west"]),
        f(edge_length["north"]), f(edge_length["south"]),
        khd("east"), khd("west"), khd("north"), khd("south"),
        jnp.nan_to_num(area2d),
        jnp.where(jnp.isfinite(area2d), 1.0 / area2d, 0.0).astype(dtype),
        f(ml),
    )
    return kpack, residents


@functools.partial(
    jax.jit,
    static_argnames=("topology", "rho", "kappa_h", "kappa_vml", "kappa_vdeep",
                     "upwind", "interpret"),
)
def _assemble_pallas(
    umo, vmo, mlotst, v3dw, area2d, edge_length, distance_to_neighbour, zt,
    topology: GridTopology,
    rho: float, kappa_h: float, kappa_vml: float, kappa_vdeep: float,
    upwind: bool, interpret: bool, rho3d_arr=None,
):
    nz, ny, nx = topology.shape3d
    dtype = jnp.asarray(v3dw).dtype
    rho3d = rho3d_arr is not None

    umo, vmo, v3dw, adv_seam, wet_seam, ahn_seam, kpack, residents = \
        _prep_streams(
            umo, vmo, mlotst, v3dw, area2d, edge_length,
            distance_to_neighbour, zt, topology,
            kappa_h, kappa_vml, kappa_vdeep, upwind,
        )

    k_of = lambda s: jnp.minimum(nz - s, nz - 1)
    slab = lambda s: (k_of(s), 0, 0)
    slab_up = lambda s: (jnp.clip(nz - s - 1, 0, nz - 1), 0, 0)
    flat2d = lambda s: (0, 0)

    def spec(index_map, block=(1, ny, nx)):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    spec2d = pl.BlockSpec((ny, nx), index_map_i32(flat2d), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _assembly_kernel,
        nz=nz, ny=ny, rho=float(rho), upwind=upwind, rho3d=rho3d,
    )

    scratch = [
        pltpu.VMEM((ny, nx), dtype),
        pltpu.VMEM((ny, nx), dtype),
    ]
    if rho3d:
        rho_c, rho_seam = _prep_rho(rho3d_arr, dtype, topology)
        rho_inputs = (rho_c, rho_c)
        rho_specs = [spec(slab), spec(slab_up)]
        rho_seam_inputs = (rho_seam,)
        rho_seam_specs = [spec(slab, (1, 1, nx))]
        scratch.append(pltpu.VMEM((ny, nx), dtype))
    else:
        rho_inputs = rho_seam_inputs = ()
        rho_specs = rho_seam_specs = []

    nstreams = 13 if rho3d else 11
    out = pl.pallas_call(
        kernel,
        grid=(nz + 1,),
        in_specs=[spec(slab)] * 3
        + [spec(slab_up)]
        + rho_specs
        + [spec(slab, (1, 1, nx))] * 3
        + rho_seam_specs
        + [spec(slab, (1, 8, nx))]
        + [spec2d] * 11,
        out_specs=[spec(slab)] * 7,
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx), dtype)] * 7,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(110 if rho3d else 80) * nz * ny * nx,
            bytes_accessed=nstreams * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
    )(
        umo, vmo, v3dw, v3dw,
        *rho_inputs,
        adv_seam, wet_seam, ahn_seam,
        *rho_seam_inputs,
        kpack,
        *residents,
    )
    return StencilCoeffs(*out)


def _assembly_kernel_blocked(
    *refs,
    nz: int,
    by: int,
    nb: int,
    rho: float,
    upwind: bool,
    rho3d: bool = False,
):
    """j-blocked variant for grids whose full slab set exceeds VMEM
    (0.25-degree scale). Grid is (nb, nz+1): per j-block the k levels
    stream bottom-up with the suffix-sum carry; j-halo rows (masked
    north flux, wet factor, directed face areas of the neighbor rows,
    and — in 3D-rho mode — the neighbor rows' densities) arrive as tiny
    side streams, with the tripolar seam rows baked into the last
    block's entries. Same math as `_assembly_kernel`."""
    if rho3d:
        (umo_ref, vmo_ref, v3d_ref, v3dup_ref, rho_ref, rhoup_ref,
         advseam_ref, wetn_ref, psn_ref, phis_ref, wets_ref, pns_ref,
         rhon_ref, rhos_ref,
         kpack_ref,
         ele_ref, elw_ref, eln_ref, els_ref,
         khde_ref, khdw_ref, khdn_ref, khds_ref,
         areac_ref, inva_ref, ml_ref,
         diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
         carry_scr, prevwet_scr, prevrho_scr) = refs
    else:
        (umo_ref, vmo_ref, v3d_ref, v3dup_ref,
         advseam_ref, wetn_ref, psn_ref, phis_ref, wets_ref, pns_ref,
         kpack_ref,
         ele_ref, elw_ref, eln_ref, els_ref,
         khde_ref, khdw_ref, khdn_ref, khds_ref,
         areac_ref, inva_ref, ml_ref,
         diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
         carry_scr, prevwet_scr) = refs

    jb = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        carry_scr[...] = jnp.zeros_like(carry_scr)
        prevwet_scr[...] = jnp.zeros_like(prevwet_scr)
        if rho3d:
            prevrho_scr[...] = jnp.zeros_like(prevrho_scr)

    @pl.when(s > 0)
    def _():
        k = nz - s
        v = v3d_ref[0]
        dtype = v.dtype
        nx = v.shape[1]
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)

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

        sanitize = lambda x: jnp.where(x == x, x, zero)
        wetf_e = pltpu.roll(wetf, nx - 1, 1)
        wetf_n = jnp.concatenate([wetf[1:, :], wetn_ref[0]], axis=0)
        mask_e = wetf * wetf_e
        mask_n = wetf * wetf_n
        phi_e = sanitize(umo_ref[0]) * mask_e
        phi_n = sanitize(vmo_ref[0]) * mask_n

        phi_w = pltpu.roll(phi_e, 1, 1)
        phi_s = jnp.concatenate([phis_ref[0], phi_n[: by - 1, :]], axis=0)

        phi_b = carry_scr[...]
        phi_t = phi_b + (phi_w + phi_s - phi_e - phi_n)
        carry_scr[...] = phi_t

        not_surf = jnp.where(k > 0, one, zero)

        in_e, in_w = neg(phi_e), pos(phi_w)
        in_n, in_s = neg(phi_n), pos(phi_s)
        in_b = pos(phi_b)
        in_t = not_surf * neg(phi_t)

        on = pos(phi_n)
        last_row = jnp.where(jb == nb - 1, advseam_ref[0], on[by - 1 :, :])
        out_n = jnp.concatenate([on[: by - 1, :], last_row], axis=0)

        if rho3d:
            half = dtype.type(0.5)
            rho_c = rho_ref[0]
            pair_e = (rho_c + pltpu.roll(rho_c, nx - 1, 1)) * half
            pair_w = (rho_c + pltpu.roll(rho_c, 1, 1)) * half
            rho_n = jnp.concatenate([rho_c[1:, :], rhon_ref[0]], axis=0)
            pair_n = (rho_c + rho_n) * half
            rho_s = jnp.concatenate([rhos_ref[0], rho_c[: by - 1, :]], axis=0)
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

        thk = vclean * inva_ref[...]
        p_e = thk * ele_ref[...]
        p_w = thk * elw_ref[...]
        p_n = thk * eln_ref[...]
        p_s = thk * els_ref[...]

        wetf_w = pltpu.roll(wetf, 1, 1)
        wetf_s = jnp.concatenate([wets_ref[0], wetf[: by - 1, :]], axis=0)

        tv_e = jnp.minimum(p_e, pltpu.roll(p_w, nx - 1, 1)) * khde_ref[...] \
            * inv_v * mask_e
        tv_w = jnp.minimum(p_w, pltpu.roll(p_e, 1, 1)) * khdw_ref[...] \
            * inv_v * (wetf * wetf_w)
        a_nb_n = jnp.concatenate([p_s[1:, :], psn_ref[0]], axis=0)
        tv_n = jnp.minimum(p_n, a_nb_n) * khdn_ref[...] * inv_v * mask_n
        a_nb_s = jnp.concatenate([pns_ref[0], p_n[: by - 1, :]], axis=0)
        tv_s = jnp.minimum(p_s, a_nb_s) * khds_ref[...] * inv_v * (wetf * wetf_s)

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


def _pick_j_block(ny: int, nx: int, itemsize: int, budget_bytes: int,
                  slabs: int = 60) -> int:
    """Largest sublane-legal divisor of ny fitting the VMEM budget.

    Legality: unless equal to ny, the block's sublane size must be a
    multiple of 8 (the f32 tile; Mosaic rejects other sublane block
    sizes). Mosaic double-buffers every changing block — including the
    per-jb resident 2D fields — so the working set is ~(4 in + 7 out +
    11 resident) x 2 + 2 scratch = 46 slabs; the default 60 adds headroom
    for pipeline overhead. 3D-rho mode streams 2 more slabs + 1 scratch
    -> 66. At 0.25-degree scale this yields by=216, which measured ~96%
    of the DMA peak (mid-size blocks pipeline best; see
    stencil_pallas._pick_j_block)."""
    for by in sorted((d for d in range(1, ny + 1) if ny % d == 0), reverse=True):
        if (by % 8 == 0 or by == ny) and slabs * by * nx * itemsize <= budget_bytes:
            return by
    for by in sorted((d for d in range(1, ny + 1) if ny % d == 0), reverse=True):
        if slabs * by * nx * itemsize <= budget_bytes:
            return by
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("topology", "rho", "kappa_h", "kappa_vml", "kappa_vdeep",
                     "upwind", "interpret", "by_static"),
)
def _assemble_pallas_blocked(
    umo, vmo, mlotst, v3dw, area2d, edge_length, distance_to_neighbour, zt,
    topology: GridTopology,
    rho: float, kappa_h: float, kappa_vml: float, kappa_vdeep: float,
    upwind: bool, interpret: bool, by_static=None, rho3d_arr=None,
):
    nz, ny, nx = topology.shape3d
    dtype = jnp.asarray(v3dw).dtype
    rho3d = rho3d_arr is not None

    by = by_static if by_static else _pick_j_block(
        ny, nx, dtype.itemsize, budget_bytes=80 * 1024 * 1024,
        slabs=66 if rho3d else 60,
    )
    if ny % by:
        raise ValueError(f"j-block size {by} does not divide ny={ny}")
    nb = ny // by

    umo, vmo, v3dw, adv_seam, wet_seam, ahn_seam, kpack, residents = \
        _prep_streams(
            umo, vmo, mlotst, v3dw, area2d, edge_length,
            distance_to_neighbour, zt, topology,
            kappa_h, kappa_vml, kappa_vdeep, upwind,
        )
    (ele, elw, eln, els, khde, khdw, khdn, khds, area_c, inv_area, ml) = residents

    # Halo rows per (k, jb), laid out (nz*nb, 1, nx) for row_nb indexing.
    import numpy as np

    idx_n = np.minimum((np.arange(nb) + 1) * by, ny - 1)
    idx_s = np.maximum(np.arange(nb) * by - 1, 0)

    def rows_at(x2d, idx):
        return x2d[idx, :]  # (nb, nx)

    def wet_rows(idx):
        vr = v3dw[:, idx, :]
        return jnp.where(vr == vr, dtype.type(1), dtype.type(0))

    def thk_rows(idx):
        vr = v3dw[:, idx, :]
        vc = jnp.where(vr == vr, vr, dtype.type(1))
        return vc * rows_at(inv_area, idx)[None]

    # North halos: wet factor and the neighbor row's south-face area; the
    # last block's entries are the tripolar seam rows (zeros for bipolar).
    wetn_rows = wet_rows(idx_n).at[:, nb - 1, :].set(wet_seam[:, 0, :])
    psn_rows = (thk_rows(idx_n) * rows_at(els, idx_n)[None]).at[
        :, nb - 1, :
    ].set(ahn_seam[:, 0, :])

    # South halos: masked north flux, wet factor, and the neighbor row's
    # north-face area; block 0 rows are the southern boundary (zeros).
    wets = wet_rows(idx_s)
    wets_above = wet_rows(np.minimum(idx_s + 1, ny - 1))
    vmo_s = vmo[:, idx_s, :]
    phis_rows = (
        jnp.where(vmo_s == vmo_s, vmo_s, 0.0) * wets * wets_above
    ).at[:, 0, :].set(0.0)
    wets_rows = wets.at[:, 0, :].set(0.0)
    pns_rows = (thk_rows(idx_s) * rows_at(eln, idx_s)[None]).at[:, 0, :].set(0.0)

    as_rows = lambda x: x.reshape(nz * nb, 1, nx)

    if rho3d:
        rho_c, rho_seam = _prep_rho(rho3d_arr, dtype, topology)
        # North pair partner rows; the last block pairs across the fold.
        rhon_rows = rho_c[:, idx_n, :].at[:, nb - 1, :].set(rho_seam[:, 0, :])
        # South pair partner rows; block 0's row is inert (phi_s = 0).
        rhos_rows = rho_c[:, idx_s, :]

    k_of = lambda jb, s: jnp.minimum(nz - s, nz - 1)
    blk = lambda jb, s: (k_of(jb, s), jb, 0)
    blk_up = lambda jb, s: (jnp.clip(nz - s - 1, 0, nz - 1), jb, 0)
    row_k = lambda jb, s: (k_of(jb, s), 0, 0)
    row_nb = lambda jb, s: (k_of(jb, s) * nb + jb, 0, 0)
    flat2d = lambda jb, s: (jb, 0)

    def spec(index_map, block=(1, by, nx)):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    spec2d = pl.BlockSpec((by, nx), index_map_i32(flat2d), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _assembly_kernel_blocked,
        nz=nz, by=by, nb=nb, rho=float(rho), upwind=upwind, rho3d=rho3d,
    )

    scratch = [
        pltpu.VMEM((by, nx), dtype),
        pltpu.VMEM((by, nx), dtype),
    ]
    if rho3d:
        rho_inputs = (rho_c, rho_c)
        rho_specs = [spec(blk), spec(blk_up)]
        rho_row_inputs = (as_rows(rhon_rows), as_rows(rhos_rows))
        rho_row_specs = [spec(row_nb, (1, 1, nx))] * 2
        scratch.append(pltpu.VMEM((by, nx), dtype))
    else:
        rho_inputs = rho_row_inputs = ()
        rho_specs = rho_row_specs = []

    nstreams = 13 if rho3d else 11
    out = pl.pallas_call(
        kernel,
        grid=(nb, nz + 1),
        in_specs=[spec(blk)] * 3
        + [spec(blk_up)]
        + rho_specs
        + [spec(row_k, (1, 1, nx))]
        + [spec(row_nb, (1, 1, nx))] * 5
        + rho_row_specs
        + [spec(row_k, (1, 8, nx))]
        + [spec2d] * 11,
        out_specs=[spec(blk)] * 7,
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx), dtype)] * 7,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(110 if rho3d else 80) * nz * ny * nx,
            bytes_accessed=nstreams * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
    )(
        umo, vmo, v3dw, v3dw,
        *rho_inputs,
        adv_seam,
        as_rows(wetn_rows), as_rows(psn_rows),
        as_rows(phis_rows), as_rows(wets_rows), as_rows(pns_rows),
        *rho_row_inputs,
        kpack,
        *residents,
    )
    return StencilCoeffs(*out)


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def assemble_T_pallas(
    umo,
    vmo,
    mlotst,
    gridmetrics: GridMetrics,
    wet3d=None,
    rho=RHO_DEFAULT,
    kappa_h=KAPPA_H_DEFAULT,
    kappa_vml=KAPPA_VML_DEFAULT,
    kappa_vdeep=KAPPA_VDEEP_DEFAULT,
    upwind: bool = True,
    interpret: bool | None = None,
    by_static: int | None = None,
) -> StencilCoeffs:
    """Total operator T as stencil coefficients, via the fused assembly
    kernel. Physics-identical to `assemble_transport(...).T`
    (models/transport.py) for both scalar and 3D rho (the reference's
    main density mode, matrixbuilding.jl:221-225: per-face masses from
    pair-mean densities).

    `wet3d=None` means "the NaN pattern of v3d" (the `makeindices`
    convention); an explicit mask is folded into the volume field first.
    Dispatches to the full-slab kernel when a (ny, nx) slab set fits
    VMEM, to the j-blocked kernel otherwise (0.25-degree scale), and
    falls back to the XLA pass pipeline for traced physics scalars or
    unknown topology. `by_static` forces a j-block size (testing).
    """
    topo = gridmetrics.topology
    nz, ny, nx = topo.shape3d
    itemsize = gridmetrics.v3d.dtype.itemsize
    rho3d_arr = None
    if jnp.ndim(rho) == 3:
        rho3d_arr, rho = rho, 0.0  # static rho unused in 3D mode
    n_slabs = 6 + 7 if rho3d_arr is not None else 4 + 7
    working_set = n_slabs * 2 * ny * nx * itemsize + 10 * ny * nx * itemsize

    def _static_scalar(x):
        """float(x) if x is a concrete scalar, else None (traced)."""
        if jnp.shape(x) != ():
            return None
        try:
            return float(x)
        except (jax.errors.ConcretizationTypeError, TypeError):
            return None

    scalars = [_static_scalar(v) for v in (rho, kappa_h, kappa_vml, kappa_vdeep)]

    if any(v is None for v in scalars) or topo.kind == "unknown":
        logger.debug("assemble_T_pallas: falling back to the XLA pipeline")
        from ..models.transport import assemble_transport

        wet = wet3d if wet3d is not None else (gridmetrics.v3d == gridmetrics.v3d)
        return assemble_transport(
            umo, vmo, mlotst, gridmetrics, wet,
            rho=rho3d_arr if rho3d_arr is not None else rho,
            kappa_h=kappa_h, kappa_vml=kappa_vml,
            kappa_vdeep=kappa_vdeep, upwind=upwind,
        ).T

    v3dw = gridmetrics.v3d
    if wet3d is not None:
        v3dw = jnp.where(jnp.asarray(wet3d, bool), v3dw, jnp.nan)
    if rho3d_arr is not None:
        _check_rho_wet(rho3d_arr, v3dw)

    if interpret is None:
        interpret = _default_interpret()

    common = (
        umo, vmo, mlotst, v3dw,
        gridmetrics.area2d, gridmetrics.edge_length,
        gridmetrics.distance_to_neighbour, gridmetrics.zt,
        topo,
        *scalars,
        bool(upwind), bool(interpret),
    )
    if by_static is not None or working_set > _VMEM_BUDGET:
        return _assemble_pallas_blocked(*common, by_static, rho3d_arr)
    return _assemble_pallas(*common, rho3d_arr)
