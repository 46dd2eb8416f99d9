"""L0 ingestion: the xarray adapter path on a CMIP-shaped dataset.

xarray is not installed in this environment, so the tests drive
`gridmetrics_from_xarray` / `transports_from_xarray` (which are
duck-typed and never import xarray) through a minimal stub implementing
exactly the xarray Dataset/DataArray surface the adapters touch:
``ds[name]``, ``ds.variables``, and per-variable
``attrs``/``encoding``/``dims``/``squeeze()``/``isel()``/``__array__``.

The stub dataset is CMIP-shaped the way real ACCESS-ESM1-5 output is
(reference test/online.jl:36-74, test/LocalBuiltMatrix.jl:26-52):
  * `_FillValue` sentinels (1e20) instead of NaN on land,
  * vertex arrays in (ny, nx, 4) order under the xmip-typo names
    `lon_verticies`/`lat_verticies` (LocalBuiltMatrix.jl:48-49),
  * coordinates named `longitude`/`latitude`,
  * a singleton lead axis on volcello (squeezed away),
  * a time axis on umo/vmo selected via isel.
"""

import numpy as np
import pytest

from otmb_tpu.grid.geometry import makegridmetrics
from otmb_tpu.grid.indices import makeindices
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.utils.io import (
    from_reference_order,
    gridmetrics_from_xarray,
    to_reference_order,
    transports_from_xarray,
)
from otmb_tpu.utils.synthetic import synthetic_dataset

FILL = np.float64(1.0e20)


class StubVariable:
    """The slice of xarray.DataArray behavior io.py consumes."""

    def __init__(self, data, dims=(), attrs=None, encoding=None):
        self.data = np.asarray(data)
        self.dims = tuple(dims)
        self.attrs = dict(attrs or {})
        self.encoding = dict(encoding or {})

    def squeeze(self):
        squeezed_dims = tuple(
            d for d, n in zip(self.dims, self.data.shape) if n != 1
        )
        return StubVariable(np.squeeze(self.data), squeezed_dims,
                            self.attrs, self.encoding)

    def isel(self, **sel):
        data, dims = self.data, list(self.dims)
        for name, index in sel.items():
            ax = dims.index(name)
            data = np.take(data, index, axis=ax)
            dims.pop(ax)
        return StubVariable(data, dims, self.attrs, self.encoding)

    def __array__(self, dtype=None, copy=None):
        return self.data.astype(dtype) if dtype else self.data


class StubDataset:
    def __init__(self, variables):
        self.variables = dict(variables)

    def __getitem__(self, name):
        return self.variables[name]


@pytest.fixture(scope="module", params=["bipolar", "tripolar"])
def raw(request):
    return synthetic_dataset(nx=16, ny=10, nz=5, topology=request.param,
                             seed=11)


@pytest.fixture(scope="module")
def cmip_stub(raw):
    """The synthetic dataset re-encoded the way a real CMIP file arrives."""
    ds = raw
    ny, nx = ds.lat.shape
    vol_fill = np.where(np.isnan(ds.volcello), FILL, ds.volcello)
    # (time=2, nz, ny, nx) transports: step 0 real, step 1 garbage.
    rng = np.random.default_rng(99)
    umo_t = np.stack([np.where(np.isnan(ds.umo), FILL, ds.umo),
                      rng.standard_normal(ds.umo.shape)])
    vmo_t = np.stack([np.where(np.isnan(ds.vmo), FILL, ds.vmo),
                      rng.standard_normal(ds.vmo.shape)])
    dims3 = ("lev", "j", "i")
    volcello_ds = StubDataset({
        "volcello": StubVariable(vol_fill[None], ("singleton",) + dims3,
                                 attrs={"_FillValue": float(FILL)}),
        "longitude": StubVariable(ds.lon, ("j", "i")),
        "latitude": StubVariable(ds.lat, ("j", "i")),
        "lev": StubVariable(ds.lev, ("lev",)),
        # xmip-typo names, (ny, nx, 4) vertex order — both must be handled
        "lon_verticies": StubVariable(
            np.moveaxis(ds.lon_vertices, 0, -1), ("j", "i", "vertices")),
        "lat_verticies": StubVariable(
            np.moveaxis(ds.lat_vertices, 0, -1), ("j", "i", "vertices")),
    })
    areacello_ds = StubDataset({
        "areacello": StubVariable(ds.areacello, ("j", "i")),
    })
    umo_ds = StubDataset({
        "umo": StubVariable(umo_t, ("time",) + dims3,
                            encoding={"_FillValue": float(FILL)}),
    })
    vmo_ds = StubDataset({
        "vmo": StubVariable(vmo_t, ("time",) + dims3,
                            encoding={"_FillValue": float(FILL)}),
    })
    return volcello_ds, areacello_ds, umo_ds, vmo_ds


def _direct_gridmetrics(raw):
    return makegridmetrics(
        areacello=raw.areacello, volcello=raw.volcello, lon=raw.lon,
        lat=raw.lat, lev=raw.lev, lon_vertices=raw.lon_vertices,
        lat_vertices=raw.lat_vertices,
    )


def test_gridmetrics_from_xarray_matches_direct(raw, cmip_stub):
    volcello_ds, areacello_ds, _, _ = cmip_stub
    gm_x = gridmetrics_from_xarray(volcello_ds, areacello_ds)
    gm = _direct_gridmetrics(raw)
    assert gm_x.topology == gm.topology
    np.testing.assert_array_equal(np.asarray(gm_x.v3d), np.asarray(gm.v3d))
    np.testing.assert_array_equal(np.asarray(gm_x.thkcello),
                                  np.asarray(gm.thkcello))
    np.testing.assert_array_equal(np.asarray(gm_x.z3d), np.asarray(gm.z3d))
    for d in ("east", "west", "north", "south"):
        np.testing.assert_array_equal(
            np.asarray(gm_x.edge_length[d]), np.asarray(gm.edge_length[d]))
        np.testing.assert_array_equal(
            np.asarray(gm_x.distance_to_neighbour[d]),
            np.asarray(gm.distance_to_neighbour[d]))


def test_fill_value_becomes_nan_land(raw, cmip_stub):
    """The _FillValue sentinel must produce the same wet mask as NaN."""
    volcello_ds, areacello_ds, _, _ = cmip_stub
    gm_x = gridmetrics_from_xarray(volcello_ds, areacello_ds)
    idx = makeindices(gm_x.v3d)
    np.testing.assert_array_equal(np.asarray(idx.wet3d), raw.wet3d)


def test_transports_from_xarray_roundtrip(raw, cmip_stub):
    volcello_ds, areacello_ds, umo_ds, vmo_ds = cmip_stub
    umo, vmo, fill = transports_from_xarray(umo_ds, vmo_ds, time_index=0)
    assert fill == float(FILL)
    assert umo.shape == raw.umo.shape  # time axis dropped

    gm = gridmetrics_from_xarray(volcello_ds, areacello_ds)
    idx = makeindices(gm.v3d)
    phi_x = facefluxesfrommasstransport(
        umo=umo, vmo=vmo, gridmetrics=gm, indices=idx, fill_value=fill)
    phi = facefluxesfrommasstransport(
        umo=raw.umo, vmo=raw.vmo, gridmetrics=_direct_gridmetrics(raw),
        indices=idx)
    for leg in phi._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(phi_x, leg)), np.asarray(getattr(phi, leg)),
            err_msg=leg)

    # selecting the other time step must give different transports
    umo1, _, _ = transports_from_xarray(umo_ds, vmo_ds, time_index=1)
    assert not np.array_equal(umo1, umo)


def test_missing_variable_raises_keyerror(cmip_stub):
    volcello_ds, areacello_ds, _, _ = cmip_stub
    broken = StubDataset({k: v for k, v in volcello_ds.variables.items()
                          if "verticies" not in k})
    with pytest.raises(KeyError, match="vertices_longitude"):
        gridmetrics_from_xarray(broken, areacello_ds)


def test_reference_order_involution(raw):
    for arr in (raw.volcello, raw.areacello, raw.lon_vertices):
        ref = to_reference_order(arr)
        np.testing.assert_array_equal(from_reference_order(ref), arr)
    # reference order really is (nx, ny, nz) / (4, nx, ny)
    nz, ny, nx = raw.volcello.shape
    assert to_reference_order(raw.volcello).shape == (nx, ny, nz)
    assert to_reference_order(raw.lon_vertices).shape == (4, nx, ny)
