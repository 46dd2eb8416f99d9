"""Standalone repro for the j-blocked-Pallas-kernel-inside-while_loop
TPU instability (the guard `ops.stencil_pallas.blocked_unstable_in_while`).

NOT collected by pytest (no test_ prefix): a positive reproduction can
crash or hang the TPU *worker*, which would take the rest of a test run
down with it. Run it manually, in a subprocess, under a timeout:

    timeout 600 python tests/repro_blocked_while.py [--size NX NY NZ]

History:
  * Round 2 (jax 0.9.0, v5e, axon relay): the j-blocked stencil kernel
    inside the BiCGStab `lax.while_loop` crashed/hung the worker at the
    0.25-degree size (1440x1080x75), with and without buffer aliasing;
    the SAME kernel inside `lax.fori_loop` was stable at roofline. That
    observation created the guards now centralized in
    `blocked_unstable_in_while`.
  * Round 4 re-test, after the x64 index-map fix (ops/pallas_util.py):
    stages 1-3 all PASS at the default --iters 30 / 200 Krylov
    iterations — but re-running stage 3 with maxiter=2000 (production
    length) crashed the worker ("UNAVAILABLE: TPU worker process
    crashed or restarted"). The fault is therefore ITERATION-COUNT-
    DEPENDENT: short while_loops are fine, long ones kill the worker,
    and fori_loop chunks of any total length are fine. Hypotheses
    tested and excluded: buffer aliasing (round 2, both ways), the x64
    index-map Mosaic bug (fixed separately; stage 3 still crashes at
    2000 iters after the fix).
  * Round 5 bracketing + hypothesis split (v5e, jax 0.9.0, the
    upstream-ready result matrix):

        stage 3 (BiCGStab while_loop, blocked matvec + Thomas M)
          maxiter   30   200   1000   1500   2000
          result   PASS  PASS  PASS  CRASH  CRASH
        stage 4 (content-minimal blocked COPY kernel, same grid class)
          iters   2000
          result  PASS

    The crash threshold sits between 1000 and 1500 while_loop
    iterations (2000-3000 j-blocked stencil launches at 2 matvecs +
    2 Thomas applies per iteration). The CONTENT-MINIMAL control — a
    trivial copy kernel with the same (nb, nz+1) grid shape and block
    sizes, one input + one output stream, no scratch — PASSES at 2000
    iterations, so the trigger is NOT the multi-program launch count
    alone: it is specific to the stencil kernel's content (the 3-slot
    VMEM scratch rotation, the 11-operand stream set, or the
    rolls/concats), scaled by repetition count. The guard
    (`blocked_unstable_in_while`) now admits SHORT while_loops
    (maxiter <= 500, a 2x safety margin under the bracketed 1000-PASS
    point) when the caller provides its iteration bound, and stays
    blanket-on otherwise.

Stages:
  1. j-blocked apply kernel alone in a 30-iteration while_loop
  2. fused Thomas kernel alone in a 30-iteration while_loop (a separate
     round-4 experiment ran this kernel 4000 while_loop iterations at
     the full 0.25-degree size without a fault — the crash is specific
     to the j-blocked stencil kernel, so the sharded solver's Pallas
     Thomas preconditioner stays on the while_loop path)
  3. the full production pattern: BiCGStab while_loop with the blocked
     Pallas matvec + Pallas Thomas preconditioner (what `solve_shifted`
     would run at 0.25 degree without the guard); --bicgstab-maxiter
     2000 reproduces the worker crash
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", nargs=3, type=int, default=[1440, 1080, 75],
                    metavar=("NX", "NY", "NZ"))
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bicgstab-maxiter", type=int, default=200,
                    help="stage-3 Krylov iteration cap; 2000 reproduces "
                         "the worker crash")
    ap.add_argument("--stage", type=int, default=0,
                    help="run only this stage (0 = all)")
    args = ap.parse_args()
    nx, ny, nz = args.size

    from otmb_tpu.models.transport import assemble_transport
    from otmb_tpu.ops.stencil_pallas import (
        _resolve_variant,
        apply_stencil_pallas,
    )
    from otmb_tpu.ops.tridiag_pallas import tridiag_solve_pallas
    from otmb_tpu.utils.synthetic import synthetic_device_case

    print(f"devices={jax.devices()} grid={nx}x{ny}x{nz}", flush=True)
    gm, wet, umo, vmo, ml = synthetic_device_case(
        nx, ny, nz, topology="tripolar", dtype=jnp.float32, seed=1
    )
    topo = gm.topology
    variant = _resolve_variant("auto", topo, 4)
    print(f"variant at this size: {variant}", flush=True)
    coeffs = jax.jit(
        lambda g, w, u, v, m: assemble_transport(u, v, m, g, w).T
    )(gm, wet, umo, vmo, ml)
    jax.block_until_ready(coeffs)
    chi = jnp.where(wet, jnp.float32(1.0), jnp.float32(0.0))
    gm = umo = vmo = ml = None

    def stage(n, name, fn):
        if args.stage and args.stage != n:
            return
        print(f"stage {n}: {name} ...", flush=True)
        t0 = time.perf_counter()
        try:
            out = fn()
            jax.block_until_ready(out)
            finite = bool(jnp.isfinite(jnp.sum(out)))
            print(f"stage {n}: PASS {time.perf_counter()-t0:.1f}s "
                  f"finite={finite}", flush=True)
        except Exception as e:
            print(f"stage {n}: FAIL {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
            sys.exit(1)

    # 1. blocked apply kernel in a while_loop
    @jax.jit
    def wl_apply(cf, c):
        def cond(st):
            return st[1] < args.iters

        def body(st):
            c, i = st
            return (apply_stencil_pallas(cf, c, topo)
                    + jnp.float32(1e-6) * c, i + 1)

        out, _ = jax.lax.while_loop(cond, body, (c, jnp.int32(0)))
        return out

    stage(1, "j-blocked apply in while_loop", lambda: wl_apply(coeffs, chi))

    # 2. Thomas kernel in a while_loop
    guarded = jnp.where(coeffs.diag != 0, coeffs.diag, jnp.float32(1.0))

    @jax.jit
    def wl_thomas(lo, di, up, c):
        def cond(st):
            return st[1] < args.iters

        def body(st):
            c, i = st
            return (tridiag_solve_pallas(lo, di, up, c)
                    + jnp.float32(1e-6) * c, i + 1)

        out, _ = jax.lax.while_loop(cond, body, (c, jnp.int32(0)))
        return out

    stage(2, "Thomas kernel in while_loop",
          lambda: wl_thomas(coeffs.bottom, guarded, coeffs.top, chi))

    # 3. the unguarded production pattern: full BiCGStab while_loop with
    # blocked matvec + Thomas preconditioner
    def bicgstab_unguarded():
        import os

        os.environ["OTMB_ALLOW_BLOCKED_WHILE"] = "1"
        try:
            from otmb_tpu.models.solvers import solve_shifted

            surf = jnp.zeros(wet.shape, jnp.float32).at[0].set(1.0)
            surf = jnp.where(wet, surf, 0.0)
            ones = jnp.where(wet, jnp.float32(1.0), 0.0)
            x, res = solve_shifted(
                coeffs, ones, topo, shift=jnp.float32(0.0), extra_diag=surf,
                tol=1e-3, maxiter=args.bicgstab_maxiter,
                apply_impl="pallas",
            )
            print(f"  bicgstab residual: {float(res):.3e}", flush=True)
            return x
        finally:
            del os.environ["OTMB_ALLOW_BLOCKED_WHILE"]

    stage(3, "full BiCGStab while_loop (blocked matvec + Thomas M)",
          bicgstab_unguarded)

    # 4. CONTENT-MINIMAL control: a trivial j-blocked COPY kernel with
    # the same grid shape and program count as the blocked stencil
    # kernel ((nb, nz+1) programs, same block sizes, one input stream,
    # one output stream, no scratch, no rolls/concats), inside the same
    # while_loop. Splits the two hypotheses for the iteration-count-
    # dependent worker crash: if THIS crashes at the same loop lengths,
    # the trigger is the multi-program launch count under a
    # data-dependent loop bound (runtime resource leak); if it
    # survives, the trigger is specific to the stencil kernel's content
    # (scratch rotation / side streams / concats).
    def copy_kernel_while():
        import functools

        import numpy as np
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from otmb_tpu.ops.pallas_util import index_map_i32
        from otmb_tpu.ops.stencil_pallas import _pick_j_block

        by = _pick_j_block(ny, nx, 4, budget_bytes=64 * 1024 * 1024)
        nb = ny // by
        print(f"  copy kernel grid: ({nb}, {nz + 1}) programs, "
              f"block (1, {by}, {nx})", flush=True)

        def kern(x_ref, o_ref):
            step = pl.program_id(1)

            @pl.when(step > 0)
            def _():
                o_ref[0] = x_ref[0] * np.float32(1.0000001)

        blk = lambda jb, s: (jnp.maximum(s - 1, 0), jb, 0)
        spec = pl.BlockSpec((1, by, nx), index_map_i32(blk),
                            memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kern, grid=(nb, nz + 1), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        )

        @jax.jit
        def wl(c):
            def cond(st):
                return st[1] < args.iters

            def body(st):
                c, i = st
                return call(c), i + 1

            out, _ = jax.lax.while_loop(cond, body, (c, jnp.int32(0)))
            return out

        return wl(chi)

    stage(4, "content-minimal blocked COPY kernel in while_loop",
          copy_kernel_while)

    print("ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    main()
