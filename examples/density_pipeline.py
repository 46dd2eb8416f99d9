"""Density pipeline demo: thetao/so -> TEOS-10 rho -> isoneutral slopes
-> GM bolus transports -> transport operator (+ optional Redi operator).

This is the reference's full density path (test/LocalBuiltMatrix.jl:71-72
computes rho = gsw_rho.(so, ct, Z3D); src/RediGM.jl feeds gsw_rho into
the potential-density slope machinery) — runnable here with NO external
package, using the built-in polyTEOS10-bsq polynomial (physics/eos.py).

    JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python examples/density_pipeline.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import otmb_tpu as otmb

MYR = 1e6 * 365.25 * 24 * 3600


def main():
    ds = otmb.synthetic_dataset(nx=48, ny=32, nz=12, topology="tripolar",
                                seed=0)
    gm = otmb.makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon, lat=ds.lat,
        lev=ds.lev, lon_vertices=ds.lon_vertices, lat_vertices=ds.lat_vertices)
    idx = otmb.makeindices(gm.v3d)
    wet = jnp.asarray(np.asarray(idx.wet3d))

    # 1. Hydrography (CMIP names: thetao ~ Conservative Temperature proxy,
    # so ~ Absolute Salinity proxy). NaN on land, like the reference.
    so = jnp.where(wet, 35.0 + 0.3 * jnp.cos(jnp.deg2rad(gm.lat))
                   * jnp.sin(jnp.deg2rad(gm.lon)), jnp.nan)
    ct = jnp.where(wet, 20.0 - 0.004 * gm.z3d
                   - 6.0 * jnp.sin(jnp.deg2rad(gm.lat)) ** 2, jnp.nan)

    # 2. In-situ density from the built-in TEOS-10 polynomial
    # (drop-in for the reference's gsw_rho.(so, ct, Z3D)).
    rho = otmb.rho_teos10(so, ct, gm.z3d)
    print(f"rho: [{float(jnp.nanmin(rho)):.2f}, "
          f"{float(jnp.nanmax(rho)):.2f}] kg/m^3")

    # 3. Isoneutral slopes of the LOCALLY-REFERENCED potential density
    # (each cell's neighbors evaluated at the center's depth, removing
    # the compressibility signal — RediGM.jl:17-35).
    s_i, s_j = otmb.potential_density_slopes(otmb.rho_teos10, so, ct, gm,
                                             idx.wet3d)
    print(f"slopes: |S_i| up to {float(jnp.nanmax(jnp.abs(s_i))):.2e}, "
          f"|S_j| up to {float(jnp.nanmax(jnp.abs(s_j))):.2e}")

    # 4. GM bolus velocity -> extra mass transports -> operator carrying
    # resolved + eddy-induced advection.
    umo2, vmo2 = otmb.add_bolus_transports(ds.umo, ds.vmo, rho, gm, idx.wet3d)
    phi = otmb.facefluxesfrommasstransport(umo=umo2, vmo=vmo2,
                                           gridmetrics=gm, indices=idx)
    ops = otmb.transportmatrix(phi=phi, mlotst=ds.mlotst, gridmetrics=gm,
                               indices=idx)
    d = otmb.operator_diagnostics(ops.T, gm.v3d, idx.wet3d, gm.topology)
    print(f"T with bolus: tau_vol {float(d['tau_vol_s'])/MYR:.3g} Myr "
          "(volume conservation)")

    # 5. Optional: the 19-point conservative Redi isoneutral-diffusion
    # operator from the same density field (beyond the reference's
    # capability set).
    rho32 = jnp.where(wet, rho, jnp.nan).astype(jnp.float32)
    redi = otmb.build_redi_operator(rho32, gm, idx.wet3d)
    chi = jnp.where(wet, 1.0 + 0.1 * jnp.sin(gm.z3d / 300.0), 0.0)
    tchi = otmb.redi_apply(redi, chi.astype(jnp.float32))
    print(f"Redi apply: max |T chi| {float(jnp.max(jnp.abs(tchi))):.3e} 1/s")

    print("OK")


if __name__ == "__main__":
    main()
