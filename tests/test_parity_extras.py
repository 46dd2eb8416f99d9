"""Parity odds and ends: shifts, lev_bnds thickness, warnings, validator."""

import warnings

import numpy as np
import pytest

from otmb_tpu.grid.geometry import cell_thickness_from_lev_bnds
from otmb_tpu.grid.topology import detect_topology, shift_values
from otmb_tpu.models.transport import transportmatrix
from otmb_tpu.ops.fluxes import facefluxesfrommasstransport
from otmb_tpu.utils.debugging import validate_operator


def test_shift_values(gridmetrics):
    topo = gridmetrics.topology
    nz, ny, nx = topo.shape3d
    rng = np.random.default_rng(0)
    x = rng.standard_normal((nz, ny, nx))

    # i: periodic
    np.testing.assert_array_equal(
        np.asarray(shift_values(x, "i", 2, topo)), np.roll(x, -2, axis=-1)
    )
    # k: fill beyond range
    s = np.asarray(shift_values(x, "k", 1, topo))
    np.testing.assert_array_equal(s[:-1], x[1:])
    assert np.isnan(s[-1]).all()
    # j backward
    s = np.asarray(shift_values(x, "j", -2, topo))
    np.testing.assert_array_equal(s[:, 2:], x[:, :-2])
    assert np.isnan(s[:, :2]).all()
    # j forward by one: fold or fill
    s = np.asarray(shift_values(x, "j", 1, topo))
    np.testing.assert_array_equal(s[:, :-1], x[:, 1:])
    if topo.is_tripolar:
        np.testing.assert_array_equal(s[:, -1], x[:, -1, ::-1])
    else:
        assert np.isnan(s[:, -1]).all()


def test_lev_bnds_thickness():
    bnds = np.array([[0.0, 10.0, 25.0], [10.0, 25.0, 45.0]])  # (2, nz)
    t = np.asarray(cell_thickness_from_lev_bnds(bnds, 4, 5))
    assert t.shape == (3, 4, 5)
    np.testing.assert_allclose(t[:, 0, 0], [10.0, 15.0, 20.0])
    # transposed input accepted
    t2 = np.asarray(cell_thickness_from_lev_bnds(bnds.T, 4, 5))
    np.testing.assert_array_equal(t, t2)


def test_unknown_topology_warns(dataset):
    bad_vlat = dataset.lat_vertices.copy()
    nx = bad_vlat.shape[-1]
    bad_vlat[2:, -1, :] = 55.0 + np.arange(nx) * 0.37
    with pytest.warns(UserWarning, match="Unknown grid topology"):
        t = detect_topology(dataset.lon_vertices, bad_vlat, 4)
    assert t.kind == "unknown"


def test_validate_operator(dataset, gridmetrics, indices):
    phi = facefluxesfrommasstransport(
        umo=dataset.umo, vmo=dataset.vmo, gridmetrics=gridmetrics, indices=indices
    )
    ops = transportmatrix(
        phi=phi, mlotst=dataset.mlotst, gridmetrics=gridmetrics, indices=indices
    )
    val = validate_operator(
        ops.T, gridmetrics.v3d, indices.wet3d, gridmetrics.topology
    )
    assert val.ok_upwind
    myr = 1e6 * 365.25 * 24 * 3600
    assert val.tau_vol_s / myr > 1e4

    # centered advection violates the upwind sign structure — validator
    # must notice
    ops_c = transportmatrix(
        phi=phi, mlotst=dataset.mlotst, gridmetrics=gridmetrics, indices=indices,
        upwind=False,
    )
    val_c = validate_operator(
        ops_c.T, gridmetrics.v3d, indices.wet3d, gridmetrics.topology
    )
    assert not val_c.offdiag_nonpositive
