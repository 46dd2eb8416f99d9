"""Randomized parity fuzzing: many random grids/masks/flows against the
per-cell oracle, catching rare land-mask and seam edge cases the fixed
fixtures might miss."""

import numpy as np
import pytest

from otmb_tpu.grid.geometry import makegridmetrics
from otmb_tpu.grid.indices import makeindices
from otmb_tpu.models.transport import transportmatrix
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.utils.sparse_export import coeffs_to_scipy
from otmb_tpu.utils.synthetic import synthetic_dataset

from reference_oracle import (
    gm_to_numpy,
    oracle_advection_matrix,
    oracle_facefluxes,
    oracle_horizontal_diffusion_matrix,
    oracle_vertical_diffusion_matrix,
)


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
@pytest.mark.parametrize("topology", ["bipolar", "tripolar"])
def test_full_operator_fuzz(seed, topology):
    rng = np.random.default_rng(seed)
    land = float(rng.uniform(0.0, 0.35))
    ds = synthetic_dataset(
        nx=12, ny=8, nz=4, topology=topology, seed=seed, land_fraction=land,
        antisymmetric_seam=bool(seed % 2),
    )
    gm = makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon, lat=ds.lat,
        lev=ds.lev, lon_vertices=ds.lon_vertices, lat_vertices=ds.lat_vertices,
    )
    idx = makeindices(gm.v3d)
    if idx.nwet == 0:
        pytest.skip("all-land draw")

    phi = facefluxesfrommasstransport(
        umo=ds.umo, vmo=ds.vmo, gridmetrics=gm, indices=idx
    )
    phi_o = oracle_facefluxes(ds.umo, ds.vmo, np.asarray(idx.wet3d), gm.topology)
    for name in phi._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(phi, name)), phi_o[name], rtol=1e-12, atol=1e-6,
            err_msg=f"{name} seed={seed}",
        )

    upwind = bool(seed % 2)
    ops = transportmatrix(
        phi=phi, mlotst=ds.mlotst, gridmetrics=gm, indices=idx, upwind=upwind
    )

    wet = np.asarray(idx.wet3d)
    gm_np = gm_to_numpy(gm)
    ref = (
        oracle_advection_matrix(phi_o, gm_np["v3d"], 1035.0, wet, gm.topology,
                                upwind=upwind)
        + oracle_horizontal_diffusion_matrix(gm_np, wet, gm.topology, 500.0)
        + oracle_vertical_diffusion_matrix(
            gm_np, wet, gm.topology, 0.1,
            omega=np.asarray(
                __import__("otmb_tpu.ops.coeffs", fromlist=["mixed_layer_mask"])
                .mixed_layer_mask(gm, ds.mlotst)
            ),
        )
        + oracle_vertical_diffusion_matrix(gm_np, wet, gm.topology, 1e-5)
    ).toarray()
    ours = coeffs_to_scipy(ops.T, idx, gm.topology).toarray()
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-15,
                               err_msg=f"seed={seed} upwind={upwind}")
