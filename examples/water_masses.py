"""Surface-origin water-mass fractions via ONE batched steady-state solve.

Partition the surface into regions; for each region r the dye steady
state (T + M) f_r = M 1_r gives the fraction of water at every cell that
last touched the surface inside region r. All regions solve together in
one lockstep batched BiCGStab (`solve_shifted_multi`): the matvec is the
multi-tracer Pallas kernel, so the operator's coefficient streams are
fetched once per iteration and shared across the whole batch.

    JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python examples/water_masses.py
"""

import numpy as np

import otmb_tpu as otmb


def main():
    ds = otmb.synthetic_dataset(nx=48, ny=32, nz=12, topology="tripolar",
                                seed=0)
    gm = otmb.makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon, lat=ds.lat,
        lev=ds.lev, lon_vertices=ds.lon_vertices, lat_vertices=ds.lat_vertices)
    idx = otmb.makeindices(gm.v3d)
    phi = otmb.facefluxesfrommasstransport(
        umo=ds.umo, vmo=ds.vmo, gridmetrics=gm, indices=idx)
    ops = otmb.transportmatrix(
        phi=phi, mlotst=ds.mlotst, gridmetrics=gm, indices=idx)

    # three latitude bands: "southern", "tropical", "northern" surface
    ny, nx = gm.shape[1:]
    j = np.arange(ny)[:, None]
    masks = np.stack([
        np.broadcast_to(j < ny // 3, (ny, nx)),
        np.broadcast_to((j >= ny // 3) & (j < 2 * ny // 3), (ny, nx)),
        np.broadcast_to(j >= 2 * ny // 3, (ny, nx)),
    ])

    fr, res = otmb.water_mass_fractions(
        ops.T, idx.wet3d, gm.topology, masks, tol=1e-12)
    wet = np.asarray(idx.wet3d)
    v = np.nan_to_num(np.asarray(gm.v3d))

    names = ("southern band", "tropical band", "northern band")
    print("volume fraction of the ocean ventilated from each band:")
    for r, name in enumerate(names):
        share = float((np.nan_to_num(np.asarray(fr[r])) * v).sum() / v.sum())
        print(f"  {name:14s}  {100 * share:5.1f} %   "
              f"(solve residual {float(res[r]):.1e})")

    s = np.asarray(fr.sum(axis=0))[wet]
    print(f"partition-of-unity check: fractions sum to "
          f"[{s.min():.4f}, {s.max():.4f}] over wet cells")
    assert 0.98 < s.min() and s.max() < 1.02


if __name__ == "__main__":
    main()
