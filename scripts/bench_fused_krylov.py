"""TPU A/B bench: fused Krylov-step kernel vs separate-pass composition.

Run on the real chip (ambient env). Measures, at the 0.25-degree size:
  1. on-chip correctness of one fused_krylov_step vs the composition;
  2. per-iteration time of solve_shifted_chunked(algorithm=bicgstab2)
     with fused=True vs fused=False (fixed work, early_stop off).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from otmb_tpu.models.transport import assemble_transport
    from otmb_tpu.models.solvers import solve_shifted_chunked
    from otmb_tpu.utils.synthetic import synthetic_device_case

    nx, ny, nz = (1440, 1080, 75) if "--quarter" in sys.argv else (360, 300, 50)
    iters = 100

    print(f"# backend={jax.default_backend()} grid={nx}x{ny}x{nz}",
          flush=True)
    gm, wet3d, umo, vmo, mlotst = synthetic_device_case(
        nx, ny, nz, topology="tripolar", dtype=jnp.float32, seed=0
    )
    topo = gm.topology
    coeffs = jax.jit(
        lambda g, w, u, v, m: assemble_transport(u, v, m, g, w).T
    )(gm, wet3d, umo, vmo, mlotst)
    jax.block_until_ready(coeffs)
    gm = umo = vmo = mlotst = None

    surf = jnp.where(
        jnp.asarray(wet3d),
        jnp.zeros((nz, ny, nx), jnp.float32).at[0].set(1.0), 0.0)
    b = jnp.where(jnp.asarray(wet3d), jnp.float32(1.0), 0.0)

    # --- 1. one-step correctness on chip ---
    from otmb_tpu.ops.krylov_pallas import fused_krylov_step
    from otmb_tpu.ops.stencil_pallas import apply_stencil_pallas
    from otmb_tpu.ops.tridiag_pallas import tridiag_solve_pallas

    shifted = coeffs.diag + surf
    a_coeffs = coeffs._replace(diag=shifted)
    guarded = jnp.where(shifted != 0, shifted, 1.0)
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(
        np.where(np.asarray(wet3d), rng.standard_normal((nz, ny, nx)), 0.0),
        jnp.float32)
    x2 = jnp.asarray(
        np.where(np.asarray(wet3d), rng.standard_normal((nz, ny, nx)), 0.0),
        jnp.float32)
    c2 = np.float32(-0.37)
    t0 = time.perf_counter()
    z, out, d = fused_krylov_step(
        a_coeffs, coeffs.bottom, guarded, coeffs.top, x1, x2, c2, x1,
        topo, interpret=False)
    jax.block_until_ready(out)
    print(f"# fused step compiled+ran in {time.perf_counter()-t0:.1f} s",
          flush=True)
    z_ref = x1 + c2 * x2
    mv = tridiag_solve_pallas(coeffs.bottom, guarded, coeffs.top, z_ref)
    out_ref = apply_stencil_pallas(a_coeffs, mv, topo)
    d_ref = jnp.vdot(x1, out_ref)
    ez = float(jnp.max(jnp.abs(z - z_ref)))
    scale = float(jnp.max(jnp.abs(out_ref)))
    eo = float(jnp.max(jnp.abs(out - out_ref))) / scale
    ed = abs(float(d) - float(d_ref)) / abs(float(d_ref))
    print(f"# on-chip correctness: z err {ez:.2e}, out rel err {eo:.2e}, "
          f"dot rel err {ed:.2e}", flush=True)
    assert eo < 1e-5 and ed < 1e-4, "fused kernel mismatch on chip"
    z = out = mv = out_ref = x2 = None

    # --- 2. fixed-work solve timing ---
    for fused in (True, False):
        label = "fused" if fused else "composition"
        # warm-up/compile
        solve_shifted_chunked(
            coeffs, b, topo, extra_diag=surf, tol=1e-30, maxiter=20,
            early_stop=False, algorithm="bicgstab2", fused=fused)
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            x, res = solve_shifted_chunked(
                coeffs, b, topo, extra_diag=surf, tol=1e-30, maxiter=iters,
                early_stop=False, algorithm="bicgstab2", fused=fused)
            jax.block_until_ready(x)
            times.append(time.perf_counter() - t0)
            x = None
        med = float(np.median(times))
        print(f"# bicgstab2 {label}: {med:.2f} s / {iters} iters = "
              f"{1e3*med/iters:.2f} ms/iter (reps "
              f"{' '.join(f'{t:.2f}' for t in times)}), res {float(res):.3e}",
              flush=True)


if __name__ == "__main__":
    main()
