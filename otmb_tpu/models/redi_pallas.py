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

HBM traffic: 19 slab streams per cell (16 coefficient arrays + chi x3 +
out) — ~2.3x less than the jnp pipeline's measured traffic. Tripolar
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

from ..ops.stencil_pallas import _default_interpret, _x64_off
from .redi import RediOperator


def _redi_kernel(
    chi_c_ref, chi_u_ref, chi_d_ref,
    ae_ref, se_ref, an_ref, sn_ref,
    czu_ref, czd_ref, cxe_ref, cxw_ref, cyn_ref, cys_ref,
    at1_ref, sti1_ref, stj1_ref, gt1_ref, invv1_ref,
    invde_ref, invdn_ref, seam_ref,
    out_ref,
    fe_s, fn_s, dcx_s, dcy_s, ft_s,
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

    chi = chi_c_ref[0]
    chi_u = chi_u_ref[0]  # slab kp-1 (clipped at the surface; cz_u == 0)
    chi_d = chi_d_ref[0]  # slab kp+1 (clipped at the floor; cz_d == 0)
    nx = chi.shape[1]

    chi_e = pltpu.roll(chi, np.int32(nx - 1), 1)
    chi_w = pltpu.roll(chi, np.int32(1), 1)
    # north: seam row streamed in (i-reversed fold for tripolar; dead row
    # otherwise — its coefficients are zero); south: zero fill at j == 0
    # (cy_s and the f_n south-shift both demand exact zeros there).
    chi_n = jnp.concatenate([chi[1:, :], seam_ref[0]], axis=0)
    chi_s = jnp.concatenate([chi[0:1, :], chi[: ny - 1, :]], axis=0)

    up = lambda r: r[0]
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
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    const2d = lambda s: (0, 0, 0)

    kernel = functools.partial(_redi_kernel, ny=ny)
    f = lambda a: a.astype(dtype)

    return pl.pallas_call(
        kernel,
        grid=(nz + 1,),
        in_specs=(
            [spec(kp), spec(kp_up), spec(kp1)]          # chi c/u/d
            + [spec(kp)] * 10                            # ae..cy_s at kp
            + [spec(kp1)] * 5                            # at,s_ti,s_tj,g_t,inv_v at kp+1
            + [spec(const2d), spec(const2d)]             # inv_de, inv_dn
            + [spec(kp, (1, 1, nx))]                     # seam row
        ),
        out_specs=spec(kp1),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        scratch_shapes=[pltpu.VMEM((ny, nx), dtype)] * 5,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=60 * nz * ny * nx,
            bytes_accessed=19 * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
    )(
        chi, chi, chi,
        f(op.ae), f(op.s_e), f(op.an), f(op.s_n),
        f(op.cz_u), f(op.cz_d), f(op.cx_e), f(op.cx_w), f(op.cy_n), f(op.cy_s),
        f(op.at), f(op.s_ti), f(op.s_tj), f(op.g_t), f(op.inv_v),
        f(op.inv_de).reshape(1, ny, nx), f(op.inv_dn).reshape(1, ny, nx),
        seam,
    )


#: the full input block set must fit VMEM twice (pipeline double buffering)
_REDI_VMEM_BUDGET = 100 * 1024 * 1024


def redi_supported_by_pallas(op: RediOperator) -> bool:
    _, ny, nx = op.topology.shape3d
    return 2 * 22 * ny * nx * 4 <= _REDI_VMEM_BUDGET


def redi_apply_pallas(op: RediOperator, chi, interpret: bool | None = None):
    """d(chi)/dt of Redi isoneutral diffusion via the fused kernel.

    Bit-compatible with `redi_apply` up to float reassociation. Falls
    back to the jnp pipeline when the slab working set exceeds VMEM
    (0.25-degree-scale grids; a j-blocked variant is future work) or the
    field is 64-bit on a real TPU.
    """
    from .redi import redi_apply

    if interpret is None:
        interpret = _default_interpret()
    chi = jnp.asarray(chi)
    if not redi_supported_by_pallas(op) or (
        not interpret and chi.dtype.itemsize > 4
    ):
        return redi_apply(op, chi)
    if interpret:
        return _redi_pallas(op, chi, True)
    with _x64_off():
        return _redi_pallas(op, chi, False)
