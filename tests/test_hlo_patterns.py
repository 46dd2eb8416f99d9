"""Communication-pattern regression: the sharded steady-state hot path
must lower to neighbor collective-permutes only.

The halo layer (parallel/halo.py) is written so every inter-shard
transfer is a 1-cell edge exchange via lax.ppermute — which XLA compiles
to `collective-permute` ops that ride the ICI neighbor links. A GSPMD or
shard_map regression could silently replace those with `all-gather` /
`all-reduce` (full-mesh traffic, O(devices) more bytes); this test pins
the compiled-HLO communication pattern so that cannot happen unnoticed.
"""

import numpy as np
import pytest
import jax

from otmb_tpu.models.transport import transportmatrix
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.parallel.halo import apply_stencil_halo, euler_propagate_halo
from otmb_tpu.parallel.mesh import make_grid_mesh, shard_pytree, sharding_for


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_grid_mesh(jax.devices()[:8])


@pytest.fixture(scope="module", params=["bipolar", "tripolar"])
def case(request, mesh):
    from otmb_tpu.grid.geometry import makegridmetrics
    from otmb_tpu.grid.indices import makeindices
    from otmb_tpu.utils.synthetic import synthetic_dataset

    ds = synthetic_dataset(nx=16, ny=8, nz=6, topology=request.param, seed=3)
    gm = makegridmetrics(
        areacello=ds.areacello, volcello=ds.volcello, lon=ds.lon, lat=ds.lat,
        lev=ds.lev, lon_vertices=ds.lon_vertices, lat_vertices=ds.lat_vertices,
    )
    idx = makeindices(gm.v3d)
    phi = facefluxesfrommasstransport(
        umo=ds.umo, vmo=ds.vmo, gridmetrics=gm, indices=idx
    )
    ops = transportmatrix(
        phi=phi, mlotst=ds.mlotst, gridmetrics=gm, indices=idx
    )
    wet = np.asarray(idx.wet3d)
    chi = np.where(wet, 1.0, 0.0)
    coeffs_sh = shard_pytree(mesh, ops.T)
    chi_sh = jax.device_put(chi, sharding_for(mesh, chi))
    return gm.topology, coeffs_sh, chi_sh


def _compiled_hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def _assert_permute_only(hlo: str, what: str):
    # Accept both spellings XLA uses across versions/passes.
    assert ("collective-permute" in hlo) or ("collective_permute" in hlo), (
        f"{what}: no collective-permute in compiled HLO — halo exchange "
        "is not lowering to neighbor transfers"
    )
    for bad in ("all-gather", "all_gather", "all-reduce", "all_reduce",
                "all-to-all", "all_to_all"):
        assert bad not in hlo, (
            f"{what}: compiled HLO contains {bad!r} — the steady path must "
            "use only neighbor collective-permutes"
        )


def test_apply_hlo_is_permute_only(mesh, case):
    topo, coeffs_sh, chi_sh = case
    hlo = _compiled_hlo(
        lambda c, x: apply_stencil_halo(c, x, topo, mesh), coeffs_sh, chi_sh
    )
    _assert_permute_only(hlo, "apply_stencil_halo")


@pytest.mark.parametrize("overlap", [False, True])
def test_propagate_hlo_is_permute_only(mesh, case, overlap):
    topo, coeffs_sh, chi_sh = case
    hlo = _compiled_hlo(
        lambda c, x: euler_propagate_halo(c, x, 300.0, 10, topo, mesh,
                                          overlap=overlap),
        coeffs_sh, chi_sh,
    )
    _assert_permute_only(hlo, f"euler_propagate_halo(overlap={overlap})")
