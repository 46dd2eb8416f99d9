"""CLI round trip: build -> diagnose -> idealage -> fractions on a
synthetic dataset, driving `otmb_tpu.__main__.main` in-process."""

import numpy as np
import pytest

from otmb_tpu.__main__ import main


@pytest.fixture(scope="module")
def input_npz(tmp_path_factory):
    from otmb_tpu.utils.synthetic import synthetic_dataset

    ds = synthetic_dataset(nx=24, ny=16, nz=8, topology="tripolar", seed=1)
    p = tmp_path_factory.mktemp("cli") / "in.npz"
    np.savez(
        p,
        areacello=np.asarray(ds.areacello), volcello=np.asarray(ds.volcello),
        lon=np.asarray(ds.lon), lat=np.asarray(ds.lat),
        lev=np.asarray(ds.lev),
        lon_vertices=np.asarray(ds.lon_vertices),
        lat_vertices=np.asarray(ds.lat_vertices),
        umo=np.nan_to_num(np.asarray(ds.umo)),
        vmo=np.nan_to_num(np.asarray(ds.vmo)),
        mlotst=np.asarray(ds.mlotst),
    )
    return p


def test_cli_pipeline(input_npz, tmp_path):
    op = tmp_path / "op.npz"
    assert main(["build", str(input_npz), str(op)]) == 0
    assert main(["diagnose", str(op)]) == 0

    age = tmp_path / "age.npz"
    assert main(["idealage", str(op), str(age), "--tol", "1e-10"]) == 0
    with np.load(age) as d:
        gamma = d["ideal_age_seconds"]
    assert np.isfinite(gamma[np.isfinite(gamma)]).all()

    fr = tmp_path / "fr.npz"
    assert main(["fractions", str(op), str(fr), "--bands", "3",
                 "--tol", "1e-10"]) == 0
    with np.load(fr) as d:
        fracs = d["fractions"]
        assert fracs.shape[0] == 3
        s = np.nansum(fracs, axis=0)
        wet = np.isfinite(fracs[0])
        # partition of unity up to the surface-divergence imbalance
        assert abs(float(np.nanmean(s[wet])) - 1.0) < 1e-2
