"""Fused Krylov-step Pallas kernel: K(z) = A(M(z)) in ONE HBM sweep.

The chunked BiCGStab(2) engine (models/solvers.py:solve_shifted_chunked,
algorithm="bicgstab2") spends each half-iteration on

    z   = x1 + c * x2          (vector combination, 3 streams)
    Mz  = M(z)                 (tridiag Thomas solve, 5 streams)
    out = A(Mz)                (7-point stencil, 9 streams)
    d   = <rhat, out>          (dot, 2 streams)

as four separate memory-bound passes (~19 grid streams). Round-4 verdict:
per-iteration cost was ~5x the bare matvec — the vector algebra, not the
matvec, dominated the 0.25-degree solves. This kernel fuses all four into
one two-phase sweep per j-block (~13 streams, no intermediate vector ever
touching HBM):

  * FORWARD phase (grid steps 0..nz-1, k ascending): streams the tridiag
    coefficients and x1/x2 slabs, forms z on the fly (writing it out —
    the Krylov recurrence needs the combination itself), and runs the
    Thomas forward sweep with cp/dp held in VMEM scratch.
  * BACKWARD phase (steps nz..2nz-1, k descending): reconstructs M(z)
    level-by-level from the cp/dp scratch via the back-substitution
    recurrence (two (by, nx) carry slots, never materialized in HBM),
    applies the 7-point stencil to it (the k-1 neighbor is one extra
    recurrence step; the k+1 neighbor is the previous carry), and
    accumulates <rhat, out> into an SMEM scalar per j-block.

The j-halo rows of M(z) needed by the stencil cannot come from
neighboring blocks (each block's Thomas state is private), so the ~2*nb
boundary rows are solved OUTSIDE the kernel by a vectorized jnp Thomas
scan over (nz, rows, nx) — O(nz*nb*nx) work, negligible against the
block sweep — and streamed in exactly like the blocked stencil kernel's
halo rows (ops/stencil_pallas.py:_stencil_kernel_blocked). Same for the
tripolar seam row (i-reversed M(z) top row, reference fold semantics
gridtopology.jl:94-95).

Index maps FREEZE across the phase boundary (forward inputs clamp to
k=nz-1 during backward and vice versa), so Pallas re-fetches nothing:
the first backward block (k=nz-1) is exactly where the forward maps
stopped. No HBM traffic is wasted on the unused phase.

The operator diagonal must arrive PRE-SHIFTED (shift + extra_diag folded
in, as solve_shifted_chunked does) and the tridiag diagonal pre-guarded
(zeros replaced by 1 on land columns). Operation order inside the Thomas
sweeps matches ops/tridiag_pallas.py exactly (cp by division, dp by
reciprocal multiply), so M(z) agrees bitwise with the composition.

No reference counterpart: the reference solves its assembled sparse
matrix with a direct factorization (test/local_full.jl:165-168); this is
the TPU-native architecture's answer to the same workload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import index_map_i32
from ..grid.topology import GridTopology
from .coeffs import StencilCoeffs


def _krylov_kernel(
    # scalar (SMEM)
    c2_ref,
    # forward-phase streams
    mlo_ref, mdi_ref, mup_ref, x1_ref, x2_ref,
    # backward-phase streams
    diag_ref, e_ref, w_ref, n_ref, s_ref, t_ref, b_ref,
    mv_north_ref, mv_south_ref, mv_seam_ref,
    *rest,
    nz: int,
    by: int,
    nb: int,
    tripolar: bool,
    with_combine: bool,
    with_dot: bool,
):
    if with_dot:
        rhat_ref = rest[0]
        rest = rest[1:]
    if with_combine:
        z_ref = rest[0]
        rest = rest[1:]
    out_ref = rest[0]
    rest = rest[1:]
    if with_dot:
        dot_ref = rest[0]
        rest = rest[1:]
    cp_scr, dp_scr, mva_scr, mvb_scr = rest[:4]
    acc_scr = rest[4] if with_dot else None

    jb = pl.program_id(0)
    s = pl.program_id(1)
    nz_i = np.int32(nz)
    one_i = np.int32(1)

    @pl.when(s < nz_i)
    def _forward():
        k = s
        if with_combine:
            z = x1_ref[0] + c2_ref[0, 0] * x2_ref[0]
            z_ref[0] = z
        else:
            z = x1_ref[0]
        # Previous cp/dp come from dedicated carry slots (mva/mvb are
        # repurposed as cp_prev/dp_prev carriers during the forward
        # phase — they are only needed in the backward phase), avoiding
        # a dynamically-indexed re-read of the big scratch every step.
        cp_prev = jnp.where(k > 0, mva_scr[...], 0.0)
        dp_prev = jnp.where(k > 0, mvb_scr[...], 0.0)
        one = jnp.ones((), z.dtype)
        denom = mdi_ref[0] - mup_ref[0] * cp_prev
        denom = jnp.where(denom != 0, denom, one)
        # ONE divide per element (reciprocal-multiply for both cp and
        # dp): f32 divides are multi-cycle on the VPU and the Thomas
        # recurrence is the fused kernel's compute hot spot.
        rec = one / denom
        cp = mlo_ref[0] * rec
        dp = (z - mup_ref[0] * dp_prev) * rec
        cp_scr[k] = cp
        dp_scr[k] = dp
        mva_scr[...] = cp
        mvb_scr[...] = dp

    @pl.when(s >= nz_i)
    def _backward():
        k = np.int32(2 * nz - 1) - s
        first = s == nz_i
        # Back-substitution carries: mva holds M(z)[k] (computed as the
        # previous step's k-1 value), mvb holds M(z)[k+1]. At the
        # seafloor the k+1 neighbor is CLAMPED to the level itself —
        # matching the stencil kernels' index-map clamp (the bottom
        # coefficient is zero there in real operators, but composition
        # equality must hold for arbitrary coefficients).
        # At the first backward step mva/mvb still hold the forward
        # phase's cp/dp carries at nz-1, so mv at nz-1 (= dp[nz-1]) is
        # exactly mvb's content — no big-scratch read needed.
        mv_k = jnp.where(first, mvb_scr[...], mva_scr[...])
        mv_kp1 = jnp.where(first, mv_k, mvb_scr[...])
        km1 = jnp.maximum(k - one_i, 0)
        mv_km1 = jnp.where(
            k > 0, dp_scr[km1] - cp_scr[km1] * mv_k, 0.0
        )

        chi = mv_k
        nx = chi.shape[1]
        east = pltpu.roll(chi, np.int32(nx - 1), 1)
        west = pltpu.roll(chi, np.int32(1), 1)
        if tripolar:
            last_row = jnp.where(
                jb == nb - 1, mv_seam_ref[0], mv_north_ref[0]
            )
        else:
            last_row = mv_north_ref[0]  # dead at the global top (zero coef)
        north = jnp.concatenate([chi[1:, :], last_row], axis=0)
        south = jnp.concatenate([mv_south_ref[0], chi[: by - 1, :]], axis=0)

        up = lambda r: r[0].astype(chi.dtype)
        acc = up(diag_ref) * chi
        acc += up(e_ref) * east + up(w_ref) * west
        acc += up(n_ref) * north + up(s_ref) * south
        acc += up(t_ref) * mv_km1 + up(b_ref) * mv_kp1
        out_ref[0] = acc

        if with_dot:
            part = jnp.sum(rhat_ref[0].astype(jnp.float32)
                           * acc.astype(jnp.float32))
            acc_scr[0] = jnp.where(first, part, acc_scr[0] + part)

            @pl.when(s == np.int32(2 * nz - 1))
            def _():
                dot_ref[jb, 0] = acc_scr[0]

        mvb_scr[...] = mv_k
        mva_scr[...] = mv_km1


def _pick_j_block_krylov(nz: int, ny: int, nx: int, itemsize: int,
                         budget_bytes: int) -> int | None:
    """j-block for the fused Krylov kernel: the dominant VMEM cost is the
    (nz, by, nx) cp/dp scratch pair; on top of that ~15 double-buffered
    (by, nx) stream blocks. Same divisibility rules and mid-size
    preference as stencil_pallas._pick_j_block."""
    need = lambda by: (2 * nz + 2 + 2 * 15) * by * nx * itemsize
    divisors = sorted((d for d in range(1, ny + 1) if ny % d == 0),
                      reverse=True)
    legal = [d for d in divisors
             if (d % 8 == 0 or d == ny) and need(d) <= budget_bytes]
    preferred = [d for d in legal if d <= 256]
    if preferred:
        return preferred[0]
    return legal[-1] if legal else None


def _thomas_rows(lo, di, up, b):
    """Vectorized Thomas solve over (nz, R, nx) row stacks — the same
    op order as the fused kernel's forward sweep (ONE reciprocal, cp and
    dp by multiply, denom != 0 guard), so results match the in-kernel
    sweep bitwise. Used for the handful of j-halo/seam rows the fused
    kernel cannot compute block-locally."""
    nz = b.shape[0]
    one = jnp.ones((), b.dtype)

    def fwd(carry, k):
        cp_prev, dp_prev = carry
        denom = di[k] - up[k] * cp_prev
        denom = jnp.where(denom != 0, denom, one)
        rec = one / denom
        cp = lo[k] * rec
        dp = (b[k] - up[k] * dp_prev) * rec
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(b[0])
    _, (cps, dps) = jax.lax.scan(fwd, (zeros, zeros), jnp.arange(nz))

    def bwd(x_next, k):
        x = dps[k] - cps[k] * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, zeros, jnp.arange(nz), reverse=True)
    return xs


def _halo_row_slices(a, by: int, nb: int, ny: int):
    """The 2*nb+1 j-halo/seam source rows as STRIDED SLICES, concatenated
    along axis 1 in the order [north rows (nb), south rows (nb), top row].

    Equivalent to `a[:, rows, :]` with rows = [min((jb+1)*by, ny-1)...,
    max(jb*by-1, 0)..., ny-1] — but a fancy-index gather makes XLA assign
    the operand a {2,0,1} layout and TRANSPOSE-COPY the whole array
    before the kernel (measured 1.57 ms per array at the 0.25-degree
    size, five arrays per call = 7.8 ms, dwarfing the fusion win).
    Strided lax.slice keeps the default layout."""
    import jax.lax as lax

    top = lax.slice_in_dim(a, ny - 1, ny, axis=1)
    if nb == 1:
        north = top
        south = lax.slice_in_dim(a, 0, 1, axis=1)
    else:
        north = jnp.concatenate([
            lax.slice_in_dim(a, by, (nb - 1) * by + 1, stride=by, axis=1),
            top,
        ], axis=1)
        south = jnp.concatenate([
            lax.slice_in_dim(a, 0, 1, axis=1),
            lax.slice_in_dim(a, by - 1, (nb - 1) * by, stride=by, axis=1),
        ], axis=1)
    return jnp.concatenate([north, south, top], axis=1)


def krylov_coeff_rows(m_lower, m_diag, m_upper, topology: GridTopology,
                      by_static: int | None = None):
    """Precompute the tridiag coefficient halo-row stacks for
    `fused_krylov_step` (they are constant across a solve; passing them
    via `m_rows` saves three per-call row extractions)."""
    nz, ny, nx = topology.shape3d
    by = by_static or _pick_j_block_krylov(
        nz, ny, nx, jnp.asarray(m_diag).dtype.itemsize,
        budget_bytes=96 * 1024 * 1024)
    nb = ny // by
    return tuple(_halo_row_slices(jnp.asarray(a), by, nb, ny)
                 for a in (m_lower, m_diag, m_upper))


@functools.partial(jax.jit, static_argnames=(
    "topology", "interpret", "with_combine", "with_dot", "by_static"))
def fused_krylov_step(
    a_coeffs: StencilCoeffs,
    m_lower,
    m_diag,
    m_upper,
    x1,
    x2,
    c2,
    rhat,
    topology: GridTopology,
    interpret: bool = False,
    with_combine: bool = True,
    with_dot: bool = True,
    by_static: int | None = None,
    m_rows=None,
):
    """One fused Krylov half-iteration:

        z   = x1 + c2 * x2            (skipped when not with_combine)
        out = A(M(z))                 (A = 7-pt stencil on a_coeffs,
                                       M = tridiag solve on m_lower/
                                       m_diag/m_upper — diag pre-guarded)
        d   = <rhat, out>             (skipped when not with_dot)

    Returns (z, out, d) — z is x1 itself when not with_combine, d is
    None when not with_dot. All fields (nz, ny, nx); `a_coeffs.diag`
    must already contain shift + extra_diag (see solve_shifted_chunked).
    """
    nz, ny, nx = topology.shape3d
    x1 = jnp.asarray(x1)
    dtype = x1.dtype
    by = by_static or _pick_j_block_krylov(
        nz, ny, nx, dtype.itemsize, budget_bytes=96 * 1024 * 1024
    )
    if by is None:
        raise ValueError(f"no legal j-block for fused krylov at {(ny, nx)}")
    nb = ny // by
    tripolar = topology.is_tripolar

    c2 = jnp.asarray(c2, dtype).reshape(1, 1)
    if not with_combine:
        x2 = x1  # dead stream, still needs a concrete operand

    # ---- halo/seam rows of M(z): solved outside on sliced columns ----
    g = lambda a: _halo_row_slices(a, by, nb, ny)
    z_rows = (g(x1) + c2[0, 0] * g(x2)) if with_combine else g(x1)
    if m_rows is None:
        m_rows = (g(m_lower), g(m_diag), g(m_upper))
    mv_rows = _thomas_rows(m_rows[0], m_rows[1], m_rows[2], z_rows)
    mv_north = mv_rows[:, :nb, :].reshape(nz * nb, 1, nx)
    mv_south = mv_rows[:, nb : 2 * nb, :].reshape(nz * nb, 1, nx)
    top_row = mv_rows[:, 2 * nb, :]
    mv_seam = (top_row[:, ::-1] if tripolar else top_row).reshape(nz, 1, nx)

    # ---- block specs ----
    nz_i = nz  # python ints inside maps; index_map_i32 pins the dtype
    fwd_k = lambda jb, s: (jnp.minimum(s, nz_i - 1), jb, 0)
    bwd_k = lambda jb, s: (jnp.minimum(nz_i - 1, 2 * nz_i - 1 - s), jb, 0)
    row_nb = lambda jb, s: (
        jnp.minimum(nz_i - 1, 2 * nz_i - 1 - s) * nb + jb, 0, 0)
    row_seam = lambda jb, s: (jnp.minimum(nz_i - 1, 2 * nz_i - 1 - s), 0, 0)

    def spec(index_map, block):
        return pl.BlockSpec(block, index_map_i32(index_map),
                            memory_space=pltpu.VMEM)

    smem_scalar = pl.BlockSpec(
        (1, 1), index_map_i32(lambda jb, s: (0, 0)),
        memory_space=pltpu.SMEM)

    in_specs = (
        [smem_scalar]
        + [spec(fwd_k, (1, by, nx))] * 5          # mlo mdi mup x1 x2
        + [spec(bwd_k, (1, by, nx))] * 7          # 7 stencil coeffs
        + [spec(row_nb, (1, 1, nx))] * 2          # mv north/south rows
        + [spec(row_seam, (1, 1, nx))]            # mv seam row
    )
    operands = [
        c2, m_lower, m_diag, m_upper, x1, x2,
        a_coeffs.diag, a_coeffs.east, a_coeffs.west, a_coeffs.north,
        a_coeffs.south, a_coeffs.top, a_coeffs.bottom,
        mv_north, mv_south, mv_seam,
    ]
    if with_dot:
        in_specs.append(spec(bwd_k, (1, by, nx)))  # rhat
        operands.append(jnp.asarray(rhat))

    out_specs = []
    out_shape = []
    if with_combine:
        out_specs.append(spec(fwd_k, (1, by, nx)))
        out_shape.append(jax.ShapeDtypeStruct((nz, ny, nx), dtype))
    out_specs.append(spec(bwd_k, (1, by, nx)))
    out_shape.append(jax.ShapeDtypeStruct((nz, ny, nx), dtype))
    if with_dot:
        # One (nb, 1) SMEM buffer revisited by every grid step (constant
        # index map; Mosaic requires SMEM blocks to equal the array
        # dims); each j-block writes its own row at its last step.
        out_specs.append(pl.BlockSpec(
            (nb, 1), index_map_i32(lambda jb, s: (0, 0)),
            memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((nb, 1), jnp.float32))

    scratch = [
        pltpu.VMEM((nz, by, nx), dtype),  # cp
        pltpu.VMEM((nz, by, nx), dtype),  # dp
        pltpu.VMEM((by, nx), dtype),      # mva: M(z)[k]
        pltpu.VMEM((by, nx), dtype),      # mvb: M(z)[k+1]
    ]
    if with_dot:
        scratch.append(pltpu.SMEM((1,), jnp.float32))

    kernel = functools.partial(
        _krylov_kernel, nz=nz, by=by, nb=nb, tripolar=tripolar,
        with_combine=with_combine, with_dot=with_dot,
    )

    n_streams = 13 + (2 if with_combine else 0) + (1 if with_dot else 0)
    outs = pl.pallas_call(
        kernel,
        grid=(nb, 2 * nz),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * nz * ny * nx,
            bytes_accessed=n_streams * nz * ny * nx * dtype.itemsize,
            transcendentals=0,
        ),
    )(*operands)

    i = 0
    if with_combine:
        z = outs[i]
        i += 1
    else:
        z = x1
    out = outs[i]
    i += 1
    d = jnp.sum(outs[i]) if with_dot else None
    return z, out, d
