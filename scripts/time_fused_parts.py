"""Slope-timed breakdown of the fused Krylov path at 0.25 degree.

Times data-dependent chains at two lengths (n, 3n) and reports the
slope — cancels dispatch/fetch fixed costs (bench.py methodology).
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from otmb_tpu.models.transport import assemble_transport
    from otmb_tpu.ops.krylov_pallas import fused_krylov_step
    from otmb_tpu.ops.stencil_pallas import apply_stencil_pallas
    from otmb_tpu.ops.tridiag_pallas import tridiag_solve_pallas
    from otmb_tpu.utils.synthetic import synthetic_device_case

    nx, ny, nz = 1440, 1080, 75
    gm, wet3d, umo, vmo, mlotst = synthetic_device_case(
        nx, ny, nz, topology="tripolar", dtype=jnp.float32, seed=0
    )
    topo = gm.topology
    coeffs = jax.jit(
        lambda g, w, u, v, m: assemble_transport(u, v, m, g, w).T
    )(gm, wet3d, umo, vmo, mlotst)
    jax.block_until_ready(coeffs)
    gm = umo = vmo = mlotst = None

    shifted = coeffs.diag + jnp.where(
        jnp.asarray(wet3d),
        jnp.zeros((nz, ny, nx), jnp.float32).at[0].set(1.0), 0.0)
    a_coeffs = coeffs._replace(diag=shifted)
    guarded = jnp.where(shifted != 0, shifted, 1.0)
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(
        np.where(np.asarray(wet3d), rng.standard_normal((nz, ny, nx)), 0.0),
        jnp.float32)
    x2 = x1 * jnp.float32(0.5)

    # All device arrays are jit ARGUMENTS (closing over them would bake
    # multi-GB constants into the program and ship them through the
    # remote compiler).
    ops = (a_coeffs, coeffs.bottom, guarded, coeffs.top, x2, x1)

    def slope(make_chain, label, n=8):
        f = make_chain()
        jax.block_until_ready(f(ops, x1, n))
        jax.block_until_ready(f(ops, x1, 3 * n))
        ts = []
        for rep in range(3):
            v = x1 * jnp.float32(1.0 + 1e-5 * rep)
            t0 = time.perf_counter()
            jax.block_until_ready(f(ops, v, n))
            t1 = time.perf_counter()
            jax.block_until_ready(f(ops, v * jnp.float32(1.0 + 1e-6), 3 * n))
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / (2 * n))
        med = float(np.median(ts)) * 1e3
        print(f"# {label}: {med:.2f} ms/call", flush=True)
        return med

    def chain_fused():
        @partial(jax.jit, static_argnums=2)
        def f(o, v, n):
            ac, lo, gd, up, xb, rh = o
            def body(_, c):
                z, out, d = fused_krylov_step(
                    ac, lo, gd, up, c, xb, jnp.float32(-0.3), rh,
                    topo, interpret=False)
                return out + jnp.float32(1e-20) * d
            return jax.lax.fori_loop(0, n, body, v)
        return f

    def chain_fused_nodot():
        @partial(jax.jit, static_argnums=2)
        def f(o, v, n):
            ac, lo, gd, up, xb, rh = o
            def body(_, c):
                z, out, _ = fused_krylov_step(
                    ac, lo, gd, up, c, xb, jnp.float32(-0.3), None,
                    topo, interpret=False, with_dot=False)
                return out
            return jax.lax.fori_loop(0, n, body, v)
        return f

    def chain_thomas():
        @partial(jax.jit, static_argnums=2)
        def f(o, v, n):
            ac, lo, gd, up, xb, rh = o
            def body(_, c):
                return tridiag_solve_pallas(lo, gd, up, c)
            return jax.lax.fori_loop(0, n, body, v)
        return f

    def chain_apply():
        @partial(jax.jit, static_argnums=2)
        def f(o, v, n):
            ac, lo, gd, up, xb, rh = o
            def body(_, c):
                return apply_stencil_pallas(ac, c, topo)
            return jax.lax.fori_loop(0, n, body, v)
        return f

    def chain_composition():
        @partial(jax.jit, static_argnums=2)
        def f(o, v, n):
            ac, lo, gd, up, xb, rh = o
            def body(_, c):
                z = c + jnp.float32(-0.3) * xb
                mv = tridiag_solve_pallas(lo, gd, up, z)
                out = apply_stencil_pallas(ac, mv, topo)
                d = jnp.vdot(rh, out)
                return out + jnp.float32(1e-20) * d
            return jax.lax.fori_loop(0, n, body, v)
        return f

    slope(chain_apply, "stencil apply alone")
    slope(chain_thomas, "thomas alone")
    slope(chain_composition, "composition z+M+A+dot")
    slope(chain_fused, "fused K (with dot)")
    slope(chain_fused_nodot, "fused K (no dot)")


if __name__ == "__main__":
    main()
