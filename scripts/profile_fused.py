"""Device-trace profile of the fused Krylov kernel vs its composition."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from otmb_tpu.models.transport import assemble_transport
    from otmb_tpu.ops.krylov_pallas import fused_krylov_step
    from otmb_tpu.ops.stencil_pallas import apply_stencil_pallas
    from otmb_tpu.ops.tridiag_pallas import tridiag_solve_pallas
    from otmb_tpu.utils.profiling import trace_kernel_times
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
    x2 = x1 * 0.5

    # chained calls inside one jit so the relay cannot pipeline
    from functools import partial

    @partial(jax.jit, static_argnums=(4,))
    def chain_fused(ac, lo, up, v, n):
        def body(_, c):
            z, out, d = fused_krylov_step(
                ac, lo, guarded, up, c, x2, jnp.float32(-0.3), x1,
                topo, interpret=False)
            return out * (1.0 + 1e-12 * d)
        return jax.lax.fori_loop(0, n, body, v)

    @partial(jax.jit, static_argnums=(4,))
    def chain_comp(ac, lo, up, v, n):
        def body(_, c):
            z = c + jnp.float32(-0.3) * x2
            mv = tridiag_solve_pallas(lo, guarded, up, z)
            out = apply_stencil_pallas(ac, mv, topo)
            d = jnp.vdot(x1, out)
            return out * (1.0 + 1e-12 * d)
        return jax.lax.fori_loop(0, n, body, v)

    @partial(jax.jit, static_argnums=(3,))
    def chain_thomas(lo, up, v, n):
        def body(_, c):
            return tridiag_solve_pallas(lo, guarded, up, c)
        return jax.lax.fori_loop(0, n, body, v)

    n = 20
    for name, fn, args in [
        ("fused", chain_fused, (a_coeffs, coeffs.bottom, coeffs.top, x1, n)),
        ("composition", chain_comp, (a_coeffs, coeffs.bottom, coeffs.top, x1, n)),
        ("thomas-only", chain_thomas, (coeffs.bottom, coeffs.top, x1, n)),
    ]:
        jax.block_until_ready(fn(*args))  # compile
        times = trace_kernel_times([lambda: jax.block_until_ready(fn(*args))])
        tot = 0.0
        for op, (cnt, avg) in sorted(times.items(), key=lambda kv: -kv[1][0] * kv[1][1]):
            if cnt * avg > 1000:  # > 1 ms total
                print(f"# {name}: {op[:72]}: {cnt} x {avg:.0f} us = {cnt*avg/1e3:.1f} ms")
            tot += cnt * avg
        print(f"# {name}: TOTAL {tot/1e3:.1f} ms for {n} applications = "
              f"{tot/1e3/n:.2f} ms/apply", flush=True)


if __name__ == "__main__":
    main()
