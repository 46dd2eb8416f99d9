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


def trace_kernel_times(thunks, logdir: str | None = None) -> dict:
    """On-device op durations from a jax.profiler trace.

    Runs each thunk (blocking on its result) under a profiler trace, then
    parses the emitted Chrome-trace JSON and returns
    ``{op_name: (count, avg_us)}`` for every XLA op on a device track.
    This is the relay-proof source of truth for kernel timing: host
    clocks through a TPU relay include dispatch/fetch RTT and can lie in
    both directions, while these durations come from the device's own
    profiler (used to settle the round-1 bench numbers; the in-loop
    Euler step is genuinely faster than its standalone HBM roofline
    because XLA pins the tracer carry and part of the coefficient
    streams in VMEM across loop iterations)."""
    import collections
    import glob
    import gzip
    import json
    import os
    import tempfile

    logdir = logdir or tempfile.mkdtemp(prefix="otmb_trace_")
    jax.profiler.start_trace(logdir)
    try:
        for thunk in thunks:
            jax.block_until_ready(thunk())
    finally:
        jax.profiler.stop_trace()

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                  recursive=True)
    )
    if not paths:
        raise RuntimeError(f"no trace.json.gz produced under {logdir}")
    events = json.load(gzip.open(paths[-1], "rt"))["traceEvents"]
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.defaultdict(lambda: [0, 0.0])
    for e in events:
        if (
            e.get("ph") == "X"
            and "dur" in e
            and str(pid_names.get(e["pid"], "")).startswith("/device")
        ):
            a = agg[e["name"]]
            a[0] += 1
            a[1] += e["dur"]
    return {name: (n, tot / n) for name, (n, tot) in agg.items()}


def dma_peak_probe(nstreams: int = 7, mbytes: int = 200):
    """A known-traffic Pallas kernel for measuring the device's sustained
    many-stream HBM DMA bandwidth (the defensible roofline denominator:
    a 2-stream copy underestimates what a multi-stream stencil kernel can
    sustain — measured 630 vs 730 GB/s on the v5e-class bench chip).

    Returns (thunk, bytes_moved): running the thunk executes one kernel
    call whose HBM traffic is exactly `bytes_moved` (nstreams reads + 1
    write, tile-aligned shapes so nominal == physical)."""
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = 512, 512  # 1 MB f32 blocks, tile-aligned
    nzb = max(1, mbytes * 1024 * 1024 // (ny * nx * 4))

    # The kernel function's name lands in the trace's device-op names
    # (pallas_call lowers to a custom call carrying it), so give it a
    # string no other op can contain — bench.py matches on it instead of
    # a generic substring like "run" that can alias unrelated ops.
    def otmb_dma_peak_probe_kernel(*refs):
        ins, o_ref = refs[:-1], refs[-1]
        acc = ins[0][0] * np.float32(0.999)
        for r in ins[1:]:
            acc = acc + r[0]
        o_ref[0] = acc

    from ..ops.pallas_util import index_map_i32

    spec = pl.BlockSpec((1, ny, nx), index_map_i32(lambda s: (s, 0, 0)),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def otmb_dma_peak_probe(*xs):
        return pl.pallas_call(
            otmb_dma_peak_probe_kernel,
            grid=(nzb,), in_specs=[spec] * nstreams, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((nzb, ny, nx), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(*xs)

    run = otmb_dma_peak_probe

    key = jax.random.PRNGKey(0)
    arrs = [
        jax.random.normal(jax.random.fold_in(key, i), (nzb, ny, nx),
                          jnp.float32)
        for i in range(nstreams)
    ]
    jax.block_until_ready(arrs)
    bytes_moved = (nstreams + 1) * nzb * ny * nx * 4
    return (lambda: run(*arrs)), bytes_moved


def kernel_time_us(times: dict, match: str) -> float | None:
    """Average on-device duration (us) of the op whose name contains
    `match`, from a `trace_kernel_times` result; None if absent."""
    hits = [(n, avg) for name, (n, avg) in times.items() if match in name]
    if not hits:
        return None
    # weight by count if several variants matched
    tot_n = sum(n for n, _ in hits)
    return sum(n * avg for n, avg in hits) / tot_n
