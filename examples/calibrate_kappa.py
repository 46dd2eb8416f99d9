"""Gradient-based calibration of the horizontal mixing coefficient.

The whole pipeline — raw transports -> fused assembly -> implicit
steady-state solve — is differentiable (ops/autodiff.py), so recovering
physical parameters from observations is a plain jax.grad descent:

  1. build a synthetic "truth" steady state with kappa_h = 800 m^2/s;
  2. start from the reference default kappa_h = 500;
  3. minimize the misfit of the steady tracer field with Adam-free
     vanilla gradient steps (the problem is smooth and 1-D).

The backward pass through the solve is ONE transpose solve (the
implicit-function adjoint) — the same machinery the reference ecosystem
uses offline for sequestration time (test/local_full.jl:165-188), here
driven automatically by jax.grad.

    JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python examples/calibrate_kappa.py
"""

import numpy as np
import jax
import jax.numpy as jnp

import otmb_tpu as otmb
from otmb_tpu.models.transport import assemble_transport


def main():
    ds = otmb.synthetic_dataset(nx=24, ny=16, nz=8, topology="tripolar",
                                seed=4)
    gm = otmb.makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon, lat=ds.lat,
        lev=ds.lev, lon_vertices=ds.lon_vertices, lat_vertices=ds.lat_vertices)
    idx = otmb.makeindices(gm.v3d)
    wet = idx.wet3d
    umo = jnp.nan_to_num(jnp.asarray(ds.umo))
    vmo = jnp.nan_to_num(jnp.asarray(ds.vmo))
    b = jnp.where(wet, 1.0, 0.0)

    solve = otmb.differentiable_solve(gm.topology, tol=1e-12)

    def steady_state(kappa_h):
        T = assemble_transport(umo, vmo, ds.mlotst, gm, wet,
                               kappa_h=kappa_h).T
        return solve(T, b, 1e-5, None)

    truth = steady_state(jnp.asarray(800.0))

    @jax.jit
    def misfit(kappa_h):
        d = steady_state(kappa_h) - truth
        return jnp.sum(jnp.where(wet, d * d, 0.0))

    grad = jax.jit(jax.grad(misfit))
    k = jnp.asarray(500.0)  # reference default as the first guess
    for it in range(30):
        g = grad(k)
        loss = misfit(k)
        # Newton-ish scalar step via a parabolic line search on g
        step = jnp.clip(loss / (jnp.abs(g) + 1e-30), 0.0, 200.0)
        k = k + jnp.where(g < 0, step, -step)
        if it % 5 == 0:
            print(f"iter {it:3d}  kappa_h = {float(k):8.2f}  "
                  f"misfit = {float(loss):.3e}")
        if float(loss) < 1e-16:
            break

    print(f"recovered kappa_h = {float(k):.2f} (truth 800.00)")
    assert abs(float(k) - 800.0) < 20.0, "calibration failed to converge"


if __name__ == "__main__":
    main()
