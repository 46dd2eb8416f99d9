"""Test configuration: CPU backend with 8 virtual devices and float64.

Must run before jax initializes its backend, hence the env manipulation at
import time. Float64 is required to reproduce the reference's Myr-scale
conservation diagnostics (the reference deliberately densifies to Float64,
velocities.jl:124-126).
"""

import os

# Force CPU: the session env presets JAX_PLATFORMS=axon (the TPU tunnel),
# but tests want the fast-compiling float64-capable CPU backend with a
# virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is not enough: the TPU-relay sitecustomize calls
# jax.config.update('jax_platforms', 'axon') at interpreter start, which
# overrides JAX_PLATFORMS and can hang every first jax op for minutes when
# the relay is busy. The config-level override below wins because it runs
# after the sitecustomize.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from otmb_tpu.grid.geometry import makegridmetrics
from otmb_tpu.grid.indices import makeindices
from otmb_tpu.utils.synthetic import synthetic_dataset


@pytest.fixture(scope="session", params=["bipolar", "tripolar"])
def topology_kind(request):
    return request.param


@pytest.fixture(scope="session")
def dataset(topology_kind):
    return synthetic_dataset(nx=18, ny=14, nz=6, topology=topology_kind, seed=3)


@pytest.fixture(scope="session")
def gridmetrics(dataset):
    ds = dataset
    return makegridmetrics(
        areacello=ds.areacello,
        volcello=ds.volcello,
        lon=ds.lon,
        lat=ds.lat,
        lev=ds.lev,
        lon_vertices=ds.lon_vertices,
        lat_vertices=ds.lat_vertices,
    )


@pytest.fixture(scope="session")
def indices(gridmetrics):
    return makeindices(gridmetrics.v3d)
