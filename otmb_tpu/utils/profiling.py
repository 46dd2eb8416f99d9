"""Profiling and observability harness.

The reference's only tooling is commented @profview hooks
(test/interactive.jl:121-122). Here:

  * `chained_step_time` — honest per-step timing of an iterated operator
    (data-dependent lax.fori_loop chain; see bench.py for why naive
    per-call timing lies on relayed TPUs);
  * `roofline_report` — achieved vs peak HBM bandwidth for a stencil-like
    step with a known byte count;
  * `trace` — context manager around jax.profiler for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import jax.numpy as jnp

#: Peak HBM bandwidth by TPU generation (GB/s), for roofline fractions.
HBM_PEAK_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}


def chained_step_time(step_fn, x0, nsteps: int = 100, repeats: int = 3) -> float:
    """Best per-step wall time of `x -> step_fn(x)` iterated `nsteps`
    times inside one jit (forces real sequential execution)."""

    @jax.jit
    def many(c):
        return jax.lax.fori_loop(0, nsteps, lambda i, v: step_fn(v), c)

    out = many(x0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = many(x0)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / nsteps)
    float(jnp.sum(out))  # scalar fetch proves completion
    return best


@dataclasses.dataclass(frozen=True)
class RooflineReport:
    seconds_per_step: float
    steps_per_second: float
    bytes_per_step: int
    achieved_gbps: float
    peak_gbps: float | None
    fraction_of_peak: float | None

    def __str__(self) -> str:
        frac = (
            f" ({100 * self.fraction_of_peak:.0f}% of {self.peak_gbps:.0f} GB/s peak)"
            if self.fraction_of_peak is not None
            else ""
        )
        return (
            f"{self.seconds_per_step * 1e6:.0f} us/step, "
            f"{self.steps_per_second:.0f} steps/s, "
            f"{self.achieved_gbps:.0f} GB/s{frac}"
        )


def roofline_report(
    step_fn, x0, bytes_per_step: int, nsteps: int = 100,
    generation: str | None = "v5e",
) -> RooflineReport:
    """Measure `step_fn` and relate achieved bandwidth to the HBM peak."""
    t = chained_step_time(step_fn, x0, nsteps=nsteps)
    gbps = bytes_per_step / t / 1e9
    peak = HBM_PEAK_GBPS.get(generation) if generation else None
    return RooflineReport(
        seconds_per_step=t,
        steps_per_second=1.0 / t,
        bytes_per_step=bytes_per_step,
        achieved_gbps=gbps,
        peak_gbps=peak,
        fraction_of_peak=(gbps / peak) if peak else None,
    )


def stencil_bytes(shape3d, dtype_bytes: int = 4, streams: int = 9) -> int:
    """Ideal HBM traffic of one stencil apply: 7 coefficient reads + 1
    tracer read + 1 write."""
    nz, ny, nx = shape3d
    return streams * nz * ny * nx * dtype_bytes


def halo_comm_model(topology, mesh_shape: tuple[int, int],
                    dtype_bytes: int = 4,
                    ici_gbps: float = 100.0,
                    hbm_gbps: float = 590.0) -> dict:
    """Analytical comm/compute model for the halo-exchanged stencil step.

    Per step each shard moves 2*(nx_local + ny_local)*nz halo cells over
    ICI while streaming ~9 full local slabs from HBM; with ICI bandwidth
    ~100 GB/s/link (v5e) vs the measured ~590 GB/s practical HBM rate the
    halo fraction predicts scaling efficiency on a slice (halos riding
    ICI, no DCN). The `bytes` ratio is mesh-size dependent:
    comm/compute ~ (perimeter/area) * (hbm/ici).
    """
    nz, ny, nx = topology.shape3d
    ny_dev, nx_dev = mesh_shape
    ny_l, nx_l = ny // ny_dev, nx // nx_dev
    halo_bytes = 2 * (nx_l + ny_l) * nz * dtype_bytes
    interior_bytes = 9 * nz * ny_l * nx_l * dtype_bytes
    t_comm = halo_bytes / (ici_gbps * 1e9)
    t_comp = interior_bytes / (hbm_gbps * 1e9)
    overlap_eff = t_comp / max(t_comp, t_comm)  # with full comm/comp overlap
    serial_eff = t_comp / (t_comp + t_comm)  # without overlap
    return {
        "halo_bytes_per_step": halo_bytes,
        "interior_bytes_per_step": interior_bytes,
        "t_comm_s": t_comm,
        "t_compute_s": t_comp,
        "scaling_efficiency_overlapped": overlap_eff,
        "scaling_efficiency_serial": serial_eff,
    }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (view in TensorBoard / XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
