"""Headline benchmark: operator assembly + apply on the ACCESS 1-degree
grid size (360 x 300 x 50), single chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "grid-points/s", "vs_baseline": N}

value = grid points processed per second for one full operator assembly
(raw umo/vmo/mlotst -> T = Tadv+TkH+TkVML+TkVdeep) plus one operator
application (the fused Pallas Euler step). Baseline: the reference builds
the same operator in "a few seconds" on a laptop (README.md:79) — we use
3 s for 5.4M cells = 1.8e6 grid-points/s.

Timing methodology: this TPU is reached through a relay with ~0.5 ms
dispatch latency and non-dependent calls get pipelined, so naive
per-call timing is wrong in both directions. All hot loops are therefore
measured as *data-dependent chains inside a single jit* (lax.fori_loop),
which forces real sequential execution; only scalars are fetched back.

Extra diagnostics (steps/s, achieved HBM bandwidth, roofline fraction) go
to stderr.
"""

import argparse
import json
import sys
import time

import numpy as np

NX, NY, NZ = 360, 300, 50
BASELINE_POINTS_PER_S = (NX * NY * NZ) / 3.0

#: ACCESS-OM2 0.25-degree size (SURVEY section 7 scale-out config).
QUARTER_DEGREE = (1440, 1080, 75)


class _Tee:
    """Mirror stderr writes into a buffer so the run's diagnostic lines
    become the BENCH_LATEST.txt claims artifact (see bench_claims.py)."""

    def __init__(self, stream):
        self.stream = stream
        self.chunks = []

    def write(self, s):
        self.chunks.append(s)
        return self.stream.write(s)

    def flush(self):
        self.stream.flush()

    def text(self):
        return "".join(self.chunks)

    def __getattr__(self, name):
        # close/isatty/fileno etc. from atexit logging handlers
        return getattr(self.stream, name)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", choices=["1deg", "quarter"], default="1deg",
                        help="grid size: ACCESS 1-degree (default) or "
                             "ACCESS-OM2 0.25-degree (1440x1080x75)")
    parser.add_argument("--workload", choices=["assembly", "idealage"],
                        default="assembly",
                        help="assembly: the headline assembly+apply metric; "
                             "idealage: full-resolution steady-state ideal-"
                             "age solve (mixed-precision refined Krylov)")
    parser.add_argument("--update-readme", action="store_true",
                        help="regenerate the README perf table from "
                             "BENCH_LATEST.txt and exit")
    parser.add_argument("--check-readme", action="store_true",
                        help="exit nonzero if the README perf table has "
                             "drifted from BENCH_LATEST.txt")
    args = parser.parse_args()
    if args.update_readme:
        import bench_claims

        bench_claims.update_readme()
        return
    if args.check_readme:
        import bench_claims

        raise SystemExit(bench_claims.check_readme())

    # The canonical default run (1-degree assembly, which also emits the
    # 0.25-degree sections) is the claims artifact.
    tee = None
    if args.scale == "1deg" and args.workload == "assembly":
        tee = _Tee(sys.stderr)
        sys.stderr = tee
    nx, ny, nz = (NX, NY, NZ) if args.scale == "1deg" else QUARTER_DEGREE

    import jax

    # Persistent compilation cache: the 0.25-degree workloads spend
    # 30-80 s per process on XLA/Mosaic compiles (measured run-to-run
    # spread of the quarter-scale idealage bench was 111-155 s with an
    # IDENTICAL solve trajectory — all compile/dispatch variance).
    # Verified to work through the TPU relay's remote compiler.
    from pathlib import Path as _Path

    jax.config.update("jax_compilation_cache_dir",
                      str(_Path(__file__).resolve().parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # Persist EVERYTHING, including sub-2s programs: each remote-compile
    # round trip through a loaded relay can queue for ~15-25 s
    # regardless of the program's own compile time, and the solve phase
    # dispatches ~8 small one-off programs — measured as a recurring
    # 140-173 s stall at the solve's first device sync while the
    # (cached) chunk programs ran at a rock-stable 1.55 s throughout.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.workload == "idealage":
        # f64 defect correction needs x64 in-process (TPU emulates f64).
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    import otmb_tpu as otmb
    from otmb_tpu.models.transport import assemble_transport
    from otmb_tpu.ops.apply import apply_stencil
    from otmb_tpu.ops.assemble_pallas import assemble_T_pallas
    from otmb_tpu.ops.stencil_pallas import (
        apply_stencil_pallas,
        euler_step_pallas,
    )

    backend = jax.default_backend()
    print(f"# backend={backend} devices={jax.devices()} grid={nx}x{ny}x{nz}",
          file=sys.stderr)

    dtype = np.float32
    ncells = nx * ny * nz
    # Generated on device: only O(ny*nx) host data crosses the (slow,
    # relayed) host<->device link even at 0.25-degree scale.
    from otmb_tpu.utils.synthetic import synthetic_device_case

    t_setup0 = time.perf_counter()
    gm, wet3d, umo, vmo, mlotst = synthetic_device_case(
        nx, ny, nz, topology="tripolar", dtype=jnp.float32, seed=0
    )
    topo = gm.topology
    chi0 = jnp.where(wet3d, jnp.float32(1.0), jnp.float32(0.0))

    coeffs = jax.jit(
        lambda gm_, wet_, u, v, m: assemble_transport(u, v, m, gm_, wet_).T
    )(gm, wet3d, umo, vmo, mlotst)
    jax.block_until_ready(coeffs)
    print(f"# setup+assembly: {time.perf_counter()-t_setup0:.1f} s "
          f"(incl. backend init + compiles)", file=sys.stderr)
    dt = np.float32(100.0)

    if args.workload == "idealage":
        # Steady-state ideal mean age on the FULL grid, solved matrix-free
        # with f32 Krylov + f64 iterative refinement. Reference anecdote:
        # (T_c+M_c)\s on a 2x2x1-COARSENED (4x smaller) ACCESS matrix
        # takes ~3 min on an M2 MacBook Air (test/local_full.jl:165-168)
        # — used as the baseline time even though this solve is at full
        # resolution.
        coeffs = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), coeffs
        )

        def stats_lines(st, label):
            for i, p in enumerate(st.get("passes", [])):
                extra = ""
                if p.get("inner_iters") is not None:
                    extra = (f", inner {p['inner_iters']} iters -> "
                             f"{p.get('inner_stop')} "
                             f"(end rel {p.get('inner_end_rel'):.2e})")
                if p.get("wall_s") is not None:
                    extra += (f", {p['wall_s']:.1f} s "
                              f"(defect eval {p.get('defect_s', 0):.1f} s)")
                cs = p.get("inner_chunk_s")
                if cs:
                    med = sorted(cs)[len(cs) // 2]
                    extra += (f"; chunks first {cs[0]:.2f} s, "
                              f"median {med:.2f} s, max {max(cs):.2f} s")
                rev = " [reverted]" if p.get("reverted") else ""
                print(f"#   {label} pass {i}: defect rel "
                      f"{p['rel_start']:.2e}{rev}{extra}", file=sys.stderr)
            if st.get("final_defect_s") is not None:
                print(f"#   {label} final defect eval "
                      f"{st['final_defect_s']:.1f} s, tail "
                      f"{st.get('tail_s', 0):.1f} s", file=sys.stderr)

        if args.scale == "quarter":
            # One COLD solve including compile, matching the in-bench
            # 0.25-degree tail (tol 1e-5); per-pass stats make the time
            # budget attributable from this artifact alone.
            st = {}
            t0 = time.perf_counter()
            gamma, res = otmb.ideal_age(
                coeffs, wet3d, topo, tol=1e-5, apply_impl="pallas",
                refine=True, stats=st,
            )
            resf = float(res)
            t_solve = time.perf_counter() - t0
            mean_age_yr = float(jnp.nanmean(gamma)) / (86400 * 365.25)
            print(
                f"# ideal-age solve ({nx}x{ny}x{nz}, 0.25-degree, incl. "
                f"compile): {t_solve:.2f} s, rel residual {resf:.2e}, "
                f"mean age {mean_age_yr:.2f} yr", file=sys.stderr,
            )
            stats_lines(st, "idealage")
            assert resf < 1e-4
            baseline_s = 180.0
            print(json.dumps({
                "metric": "ideal-age steady-state solve seconds, "
                          f"uncoarsened {nx}x{ny}x{nz} 0.25-degree grid "
                          "(f64-refined; reference: ~180 s direct solve "
                          "on a 4x-coarsened 1-degree matrix, 36x fewer "
                          "cells)",
                "value": t_solve,
                "unit": "seconds",
                "vs_baseline": baseline_s / t_solve,
            }))
            return

        gamma, res = otmb.ideal_age(
            coeffs, wet3d, topo, tol=1e-9, apply_impl="pallas", refine=True
        )
        float(res)  # warm-up/compile
        ts = []
        st = {}
        for k in range(3):
            rate = np.float32(1.0 + 1e-3 * (k + 1))
            st = {}
            t0 = time.perf_counter()
            gamma, res = otmb.ideal_age(
                coeffs, wet3d, topo, tol=1e-9, surface_rate=rate,
                apply_impl="pallas", refine=True, stats=st,
            )
            resf = float(res)
            ts.append(time.perf_counter() - t0)
        t_solve = float(np.median(ts))
        mean_age_yr = float(jnp.nanmean(gamma)) / (86400 * 365.25)
        print(
            f"# ideal-age solve ({nx}x{ny}x{nz}, full resolution): "
            f"{t_solve:.2f} s, rel residual {resf:.2e}, mean age "
            f"{mean_age_yr:.2f} yr", file=sys.stderr,
        )
        stats_lines(st, "idealage")
        assert resf < 1e-8
        baseline_s = 180.0
        print(json.dumps({
            "metric": "ideal-age steady-state solve seconds, full-resolution "
                      f"{nx}x{ny}x{nz} grid (f64-refined; reference: ~180 s "
                      "direct solve on a 4x-coarsened matrix)",
            "value": t_solve,
            "unit": "seconds",
            "vs_baseline": baseline_s / t_solve,
        }))
        return

    def chain_time(step_fn, x0, operand, nsteps):
        """Per-step time of a data-dependent in-jit chain, by slope.

        The TPU is reached through a relay whose dispatch/fetch round-trip
        is large and NOISY (single-sample RTT subtraction has produced
        negative elapsed times here). So: time the same chain at two
        lengths, n and 4n, each window ending in a scalar fetch. The
        difference cancels every fixed cost (dispatch, relay RTT, the sum
        + fetch) exactly, leaving 3n steps of pure device time.

        `operand` (the coefficient pytree) is threaded as a jit ARGUMENT:
        closing over multi-GB device arrays would bake them into the
        lowered program as constants and ship them through the remote
        compiler. Inputs differ between timed calls so a deduplicating
        relay cannot replay a cached execution.
        """

        from functools import partial

        @partial(jax.jit, static_argnums=2)
        def many(c, op_, n):
            return jax.lax.fori_loop(0, n, lambda i, v: step_fn(v, op_), c)

        state = many(x0, operand, nsteps)  # warm-up/compile n
        state = many(state, operand, 4 * nsteps)  # warm-up/compile 4n
        float(jnp.sum(state))

        # The relay caches (executable, inputs) pairs — and chains can
        # converge to a bitwise fixed point, after which "evolving" state
        # repeats and calls return from cache at impossible speeds. So
        # every timed call first perturbs the state by a distinct,
        # host-chosen float32-visible factor (the perturbation cost is a
        # fixed per-call term and cancels in the slope).
        k = [0]
        proc_jitter = np.float32(1.0 + 1e-4 * np.random.default_rng().random())

        def run(c, n):
            k[0] += 1
            c = c * (proc_jitter * np.float32(1.0 + 1e-4 * k[0]))
            t0 = time.perf_counter()
            out = many(c, operand, n)
            checksum = float(jnp.sum(out))
            assert checksum == checksum  # non-NaN
            return time.perf_counter() - t0, out

        slopes = []
        for _ in range(3):
            t1, state = run(state, nsteps)
            t4, state = run(state, 4 * nsteps)
            slopes.append((t4 - t1) / (3 * nsteps))
        return max(float(np.median(slopes)), 1e-9)

    # Self-calibrated streaming roofline: per-step time of a pure
    # elementwise read+write chain on a 256 MB array, timed the same way.
    # The calibration body must never reach a bitwise fixed point (see
    # chain_time): multiply by a factor slightly above 1 so values keep
    # drifting upward through distinct floats.
    cal = jnp.ones((64, 1024, 1024), jnp.float32)
    t_cal = chain_time(
        lambda c, s: c * s, cal, np.float32(1.0000004), 50
    )
    hbm_gbps = 2 * cal.size * 4 / t_cal / 1e9
    print(f"# measured streaming HBM bandwidth: {hbm_gbps:.0f} GB/s",
          file=sys.stderr)

    nsteps = 200 if args.scale == "1deg" else 100
    # The production step: chi - dt*T@chi fused INSIDE the kernel (no
    # separate XLA AXPY pass re-streaming the tracer from HBM).
    t_pallas = chain_time(
        lambda c, cf: euler_step_pallas(cf, c, float(dt), topo), chi0, coeffs,
        nsteps,
    )
    stream_bytes = 9 * ncells * np.dtype(dtype).itemsize
    bw = stream_bytes / t_pallas / 1e9
    print(
        f"# pallas euler step (in-loop): {t_pallas*1e6:.0f} us, "
        f"{1/t_pallas:.0f} steps/s, {bw:.0f} GB/s 9-stream-equivalent "
        "(may exceed the streaming peak: XLA pins the tracer carry and part "
        "of the coefficient streams in VMEM across loop iterations; see the "
        "trace-verified standalone line for the HBM roofline)",
        file=sys.stderr,
    )

    # Trace-verified standalone roofline: on-device op durations from the
    # device's own profiler (relay-proof), on fresh tracer fields so no
    # input can be loop-resident in VMEM. Physical bytes include the
    # (8, 128) f32 tile padding actually transferred.
    def padded_cells(ny_, nx_, sub=8, lane=128):
        return nz * ((ny_ + sub - 1) // sub * sub) * ((nx_ + lane - 1) // lane
                                                      * lane)

    try:
        from otmb_tpu.utils.profiling import (
            dma_peak_probe,
            kernel_time_us,
            trace_kernel_times,
        )

        fresh = [
            (chi0 + jnp.float32(1e-3 * (i + 1))) * jnp.float32(1.0 + 1e-4 * i)
            for i in range(4)
        ]
        jax.block_until_ready(fresh)
        apply_fn = jax.jit(lambda cf, c: apply_stencil_pallas(cf, c, topo))
        jax.block_until_ready(apply_fn(coeffs, fresh[0]))
        probe, probe_bytes = dma_peak_probe()
        jax.block_until_ready(probe())
        times = trace_kernel_times(
            [lambda c=c: apply_fn(coeffs, c) for c in fresh]
            + [probe, probe]
        )
        t_alone = kernel_time_us(times, "_apply_pallas")
        # Match the probe by its unique kernel name (a generic substring
        # like "run" can alias unrelated device ops across XLA versions).
        t_probe = kernel_time_us(times, "dma_peak_probe")
        if t_probe is None:
            print(
                "# WARNING: DMA-peak probe op not found in the trace "
                "(expected a device op containing 'dma_peak_probe'); "
                "falling back to the 2-stream streaming measurement, "
                "which understates the many-stream peak",
                file=sys.stderr,
            )
        peak_gbps = (
            probe_bytes / (t_probe * 1e-6) / 1e9 if t_probe else hbm_gbps
        )
        print(
            f"# measured many-stream DMA peak (trace-verified): "
            f"{peak_gbps:.0f} GB/s",
            file=sys.stderr,
        )
        if t_alone is not None:
            nominal = stream_bytes / (t_alone * 1e-6) / 1e9
            physical = (9 * padded_cells(ny, nx) * 4) / (t_alone * 1e-6) / 1e9
            pct = 100 * physical / max(peak_gbps, 1e-9)
            note = (
                " (ratios above 100% are real: the kernel's chi->out "
                "buffer alias makes the store an in-place rewrite of the "
                "pages just read, which the 9-distinct-stream traffic "
                "model overstates)" if pct > 100 else ""
            )
            print(
                f"# pallas apply standalone (trace-verified on-device): "
                f"{t_alone:.0f} us = {nominal:.0f} GB/s nominal / "
                f"{physical:.0f} GB/s physical "
                f"({pct:.0f}% of the measured DMA peak){note}",
                file=sys.stderr,
            )
    except Exception as e:  # profiler may be unavailable on some backends
        print(f"# trace-verified timing unavailable: {e}", file=sys.stderr)

    # mixed precision: bf16 coefficient streams, f32 tracer/accumulation
    coeffs_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), coeffs
    )
    jax.block_until_ready(coeffs_bf16)
    # Fused form: since the kernels alias chi->out, the unfused
    # `c - dt*apply(c)` chain gives the tracer a second consumer and XLA
    # inserts an alias-protection copy per step (measured 136 us vs the
    # fused 122 us pre-aliasing); the fused step keeps the carry
    # single-use.
    t_bf16 = chain_time(
        lambda c, cf: euler_step_pallas(cf, c, float(dt), topo), chi0,
        coeffs_bf16, nsteps,
    )
    print(
        f"# pallas euler step (bf16 coefs, in-loop): {t_bf16*1e6:.0f} us, "
        f"{1/t_bf16:.0f} steps/s "
        f"({stream_bytes/t_bf16/1e9:.0f} GB/s f32-9-stream-equivalent; "
        "same VMEM-residency caveat as the f32 in-loop line)",
        file=sys.stderr,
    )

    # Multi-tracer batched step: B tracers through one kernel, coefficient
    # streams shared across the batch (per-tracer traffic 2 + 7/B streams).
    try:
        from otmb_tpu.ops.stencil_pallas import euler_step_pallas_multi

        B = 8
        chis0 = jnp.stack(
            [chi0 * jnp.float32(1.0 + 1e-3 * b) for b in range(B)]
        )
        jax.block_until_ready(chis0)
        t_multi = chain_time(
            lambda c, cf: euler_step_pallas_multi(cf, c, float(dt), topo),
            chis0, coeffs, max(nsteps // 4, 25),
        )
        print(
            f"# pallas multi-tracer euler step (B={B}, in-loop): "
            f"{t_multi*1e6:.0f} us = {t_multi/B*1e6:.0f} us/tracer "
            f"({B/t_multi:.0f} tracer-steps/s, "
            f"{t_pallas/(t_multi/B):.1f}x the single-tracer step)",
            file=sys.stderr,
        )
        chis0 = None
    except Exception as e:
        print(f"# multi-tracer line unavailable: {e}", file=sys.stderr)

    t_jnp = chain_time(
        lambda c, cf: c - dt * apply_stencil(cf, c, topo), chi0, coeffs, nsteps
    )
    print(
        f"# jnp euler step:    {t_jnp*1e6:.0f} us "
        f"({stream_bytes/t_jnp/1e9:.0f} GB/s effective)",
        file=sys.stderr,
    )

    if args.scale == "1deg":
        # Redi isoneutral diffusion step through the fused kernel
        # (diagnostic only; beyond the reference's capability set).
        from otmb_tpu.models.redi import build_redi_operator
        from otmb_tpu.models.redi_pallas import redi_apply_pallas

        rho = jnp.where(
            wet3d,
            1025.0 + 0.02 * gm.z3d
            + 2e-4 * gm.z3d * jnp.cos(2 * jnp.deg2rad(gm.lon)),
            jnp.nan,
        ).astype(jnp.float32)
        redi_op = jax.jit(build_redi_operator)(rho, gm, wet3d)
        jax.block_until_ready(redi_op)
        t_redi = chain_time(
            lambda c, op_: c + dt * redi_apply_pallas(op_, c), chi0, redi_op,
            max(nsteps // 4, 10),
        )
        print(
            f"# pallas redi step (19-pt isoneutral): {t_redi*1e6:.0f} us "
            f"({1/t_redi:.0f} steps/s)",
            file=sys.stderr,
        )

        # bf16 coefficient streams (kernel upcasts in-register, f32 math)
        from otmb_tpu.models.redi import redi_operator_to_bf16

        redi_op_bf16 = redi_operator_to_bf16(redi_op)
        jax.block_until_ready(redi_op_bf16)
        t_redi_b = chain_time(
            lambda c, op_: c + dt * redi_apply_pallas(op_, c), chi0,
            redi_op_bf16, max(nsteps // 4, 10),
        )
        print(
            f"# pallas redi step (bf16 coefs, in-loop): "
            f"{t_redi_b*1e6:.0f} us ({1/t_redi_b:.0f} steps/s)",
            file=sys.stderr,
        )
        redi_op_bf16 = None

        # Batched multi-tracer Redi: the 15 coefficient slabs are shared
        # across the batch (per-tracer traffic 2 + 15/B streams vs 17).
        from otmb_tpu.models.redi_pallas import redi_apply_pallas_multi

        B_redi = 8
        chis_r = jnp.broadcast_to(chi0, (B_redi,) + chi0.shape) * (
            1.0 + 0.01 * jnp.arange(B_redi, dtype=jnp.float32)[
                :, None, None, None]
        )
        jax.block_until_ready(chis_r)
        t_redi_m = chain_time(
            lambda c, op_: c + dt * redi_apply_pallas_multi(op_, c),
            chis_r, redi_op, max(nsteps // 8, 5),
        )
        print(
            f"# pallas redi multi-tracer step (B={B_redi}, in-loop): "
            f"{t_redi_m*1e6:.0f} us = {t_redi_m/B_redi*1e6:.0f} us/tracer "
            f"({B_redi/t_redi_m:.0f} tracer-steps/s, "
            f"{t_redi*B_redi/t_redi_m:.1f}x the single-tracer step)",
            file=sys.stderr,
        )
        chis_r = None

    # Assembly: the fused Pallas assembly kernel (assemble_T_pallas
    # dispatches to the full-slab kernel at 1 degree and to the j-blocked
    # kernel at 0.25-degree scale, where the slab set exceeds VMEM).
    # Scalar feedback goes through mlotst (it genuinely changes the
    # mixed-layer operator); the Pallas call is opaque to XLA, so all 7
    # output legs are written to HBM every iteration regardless — feedback
    # through one diag element keeps the harness traffic negligible.
    from functools import partial

    n_asm = 20 if args.scale == "1deg" else 3

    @partial(jax.jit, static_argnums=4)
    def assemble_chain(u, v, m, gm_, n):
        def body(i, carry):
            t = assemble_T_pallas(u, v, m * (1.0 + 1e-12 * carry), gm_)
            return t.diag[0, 0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(assemble_chain(umo, vmo, mlotst, gm, n_asm))
    float(assemble_chain(umo, vmo, mlotst, gm, 4 * n_asm))

    # Distinct host-chosen input scaling per call: a float32-visible
    # perturbation so the relay's execution cache never sees a repeated
    # input buffer (scalar feedback alone can round away in f32).
    # Per-process jitter so no two bench processes ever submit the same
    # input buffers (the relay's execution cache may outlive a process).
    jitter = np.float32(1.0 + 1e-4 * np.random.default_rng().random())
    call_idx = [0]

    def run_asm(n):
        call_idx[0] += 1
        m = mlotst * (jitter * np.float32(1.0 + 1e-5 * call_idx[0]))
        t0 = time.perf_counter()
        r = float(assemble_chain(umo, vmo, m, gm, n))
        assert r == r
        return time.perf_counter() - t0

    slopes = []
    for _ in range(5):
        t1 = run_asm(n_asm)
        t4 = run_asm(4 * n_asm)
        slopes.append((t4 - t1) / (3 * n_asm))
    t_assembly = max(float(np.median(slopes)), 1e-9)
    print(
        f"# assembly: {t_assembly*1e3:.2f} ms "
        f"({ncells/t_assembly/1e9:.2f} G grid-points/s)",
        file=sys.stderr,
    )

    if args.scale == "1deg":
        # Analytic multichip scaling projection (one physical chip is
        # available here, so the >=80%-at-2+-hosts north star is checked
        # by model: measured HBM rate + v5e ICI 100 GB/s/link; the
        # virtual-8-mesh tests pin the comm PATTERN, this pins the MATH).
        try:
            from otmb_tpu.utils.profiling import halo_comm_model

            for shape in ((2, 2), (2, 4), (4, 8)):
                eff = halo_comm_model(topo, shape, hbm_gbps=hbm_gbps)
                print(
                    f"# projected scaling efficiency on a {shape[0]}x"
                    f"{shape[1]} mesh (analytic): "
                    f"{100*eff['scaling_efficiency_overlapped']:.0f}% "
                    f"overlapped / "
                    f"{100*eff['scaling_efficiency_serial']:.0f}% serial",
                    file=sys.stderr,
                )
        except Exception as e:
            print(f"# scaling projection unavailable: {e}", file=sys.stderr)

        # Free the 1-degree bench temporaries before the memory-heavy
        # full-resolution solve and 0.25-degree diagnostics below (the
        # probe closure alone holds 1.4 GB of HBM). Plain rebinding is
        # enough: jit caches do not retain input buffers.
        cal = fresh = probe = coeffs_bf16 = None
        rho = redi_op = None

    if args.scale == "1deg":
        # Full-resolution ideal-age steady state every round (f32 Krylov
        # through the Pallas kernel + f64 defect correction), so the
        # README's solve-time claim is captured in each BENCH_r*.json
        # stderr. x64 is toggled only around this block: the solve casts
        # its operands explicitly, and nothing below retraces f32 code.
        try:
            jax.config.update("jax_enable_x64", True)
            gamma, res = otmb.ideal_age(
                coeffs, wet3d, topo, tol=1e-9, apply_impl="pallas",
                refine=True,
            )
            float(res)  # warm-up/compile
            t0 = time.perf_counter()
            gamma, res = otmb.ideal_age(
                coeffs, wet3d, topo, tol=1e-9,
                surface_rate=np.float32(1.001), apply_impl="pallas",
                refine=True,
            )
            resf = float(res)
            t_age = time.perf_counter() - t0
            mean_age_yr = float(jnp.nanmean(gamma)) / (86400 * 365.25)
            print(
                f"# ideal-age steady state (full resolution, f64-refined): "
                f"{t_age:.2f} s, rel residual {resf:.2e}, mean age "
                f"{mean_age_yr:.1f} yr "
                "(reference: ~180 s direct solve on a 4x-coarsened matrix)",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"# ideal-age diagnostic unavailable: {e}", file=sys.stderr)
        finally:
            jax.config.update("jax_enable_x64", False)

        # Batched water-mass fractions at 1 degree: ONE lockstep batched
        # Krylov for a 4-region surface partition through the batched
        # Pallas matvec (the production water_mass_fractions path;
        # validated on-chip round 4 — the batched carry kernel inside
        # the Krylov while_loop is stable at this size).
        try:
            R = 4
            masks = np.zeros((R, ny, nx), bool)
            for r in range(R):
                masks[r, r * ny // R: (r + 1) * ny // R] = True
            t0 = time.perf_counter()
            fr, res_f = otmb.water_mass_fractions(
                coeffs, wet3d, topo, masks, tol=1e-4, apply_impl="pallas"
            )
            res_fmax = float(np.max(np.asarray(res_f)))
            t_frac = time.perf_counter() - t0
            fr = None
            print(
                f"# batched water-mass fractions (R={R}, 1-degree): "
                f"{t_frac:.2f} s, max rel residual {res_fmax:.1e}",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"# batched fractions line unavailable: {e}",
                  file=sys.stderr)

    if args.scale == "1deg":
        # Scale-out-sized single-chip diagnostics: the 0.25-degree grid
        # (j-blocked kernels), one slope pass each, so every BENCH_r*.json
        # records the quarter-degree numbers too. Free every 1-degree
        # device object first — the refined age solve below runs within
        # ~1 GB of the HBM ceiling, and the 1-degree operator/grid set
        # (~0.6 GB) tipped an in-bench run into RESOURCE_EXHAUSTED.
        coeffs = chi0 = umo = vmo = mlotst = gm = wet3d = None
        gamma = None
        try:
            qnx, qny, qnz = QUARTER_DEGREE
            qgm, qwet, qumo, qvmo, qml = synthetic_device_case(
                qnx, qny, qnz, topology="tripolar", dtype=jnp.float32, seed=1
            )
            qtopo = qgm.topology
            qchi = jnp.where(qwet, jnp.float32(1.0), jnp.float32(0.0))
            qcoeffs = jax.jit(
                lambda g, w, u, v, m: assemble_transport(u, v, m, g, w).T
            )(qgm, qwet, qumo, qvmo, qml)
            jax.block_until_ready(qcoeffs)
            # Trace-verified standalone 0.25-degree apply (f32 and bf16
            # coefficient streams) against the measured DMA peak — the
            # roofline number at the scale-out grid size.
            try:
                from otmb_tpu.utils.profiling import (
                    dma_peak_probe as _probe_fn,
                    kernel_time_us as _ktu,
                    trace_kernel_times as _tkt,
                )

                qprobe, qprobe_bytes = _probe_fn()
                jax.block_until_ready(qprobe())
                qfresh = [
                    (qchi + jnp.float32(1e-3 * (i + 1)))
                    * jnp.float32(1.0 + 1e-4 * i)
                    for i in range(3)
                ]
                jax.block_until_ready(qfresh)
                qcoeffs_bf16 = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), qcoeffs
                )
                jax.block_until_ready(qcoeffs_bf16)
                qapply32 = jax.jit(
                    lambda cf, c: apply_stencil_pallas(cf, c, qtopo)
                )
                qapply16 = jax.jit(
                    lambda cf, c: apply_stencil_pallas(cf, c, qtopo)
                )
                jax.block_until_ready(qapply32(qcoeffs, qfresh[0]))
                jax.block_until_ready(qapply16(qcoeffs_bf16, qfresh[1]))
                qtimes32 = _tkt(
                    [lambda c=c: qapply32(qcoeffs, c) for c in qfresh]
                    + [qprobe, qprobe]
                )
                qtimes16 = _tkt(
                    [lambda c=c: qapply16(qcoeffs_bf16, c) for c in qfresh]
                )
                qt32 = _ktu(qtimes32, "_apply_pallas")
                qt16 = _ktu(qtimes16, "_apply_pallas")
                qtp = _ktu(qtimes32, "dma_peak_probe")
                qpeak = (
                    qprobe_bytes / (qtp * 1e-6) / 1e9 if qtp else hbm_gbps
                )

                def qpad(sub, lane):
                    return (qnz * ((qny + sub - 1) // sub * sub)
                            * ((qnx + lane - 1) // lane * lane))

                if qt32 is not None:
                    # 7 coef + 1 chi read + 1 write, all f32 (8,128) tiles
                    qphys32 = 9 * qpad(8, 128) * 4 / (qt32 * 1e-6) / 1e9
                    print(
                        f"# 0.25-degree pallas apply standalone "
                        f"(trace-verified): f32 {qt32:.0f} us = "
                        f"{qphys32:.0f} GB/s physical "
                        f"({100 * qphys32 / max(qpeak, 1e-9):.0f}% of the "
                        f"{qpeak:.0f} GB/s DMA peak)",
                        file=sys.stderr,
                    )
                if qt16 is not None:
                    # 7 coef streams bf16 (16,128) tiles + chi/out f32
                    qphys16 = (
                        7 * qpad(16, 128) * 2 + 2 * qpad(8, 128) * 4
                    ) / (qt16 * 1e-6) / 1e9
                    print(
                        f"# 0.25-degree pallas apply standalone "
                        f"(trace-verified): bf16 coefs {qt16:.0f} us = "
                        f"{qphys16:.0f} GB/s physical "
                        f"({100 * qphys16 / max(qpeak, 1e-9):.0f}% of the "
                        f"{qpeak:.0f} GB/s DMA peak)",
                        file=sys.stderr,
                    )
            except Exception as e:
                print(f"# 0.25-degree trace-verified lines unavailable: {e}",
                      file=sys.stderr)

            # Free the trace-section buffers (probe 1.4 GB, bf16 coeffs
            # 1.7 GB, fresh tracers 1.4 GB) before the in-loop chains.
            qprobe = qfresh = qcoeffs_bf16 = None

            # The loop-optimized propagation entry (kernel-emitted halo-row
            # streams, single-use carry: no per-step alias-protection copy).
            # Timed by the same two-length slope method as chain_time.
            from otmb_tpu.ops.stencil_pallas import euler_propagate_pallas

            qprop = jax.jit(
                lambda c, cf, n: euler_propagate_pallas(
                    cf, c, float(dt), n, qtopo
                ),
                static_argnums=2,
            )
            qn = 8
            qjit2 = np.float32(1.0 + 1e-4 * np.random.default_rng().random())
            kq = [0]

            def qrun_prop(c, n, cf=None):
                kq[0] += 1
                c = c * (qjit2 * np.float32(1.0 + 1e-4 * kq[0]))
                t0 = time.perf_counter()
                out = qprop(c, qcoeffs if cf is None else cf, n)
                s = float(jnp.sum(out))
                assert s == s
                return time.perf_counter() - t0

            qrun_prop(qchi, qn)          # compile n
            qrun_prop(qchi, 4 * qn)      # compile 4n
            qslopes = []
            for _ in range(3):
                tq1 = qrun_prop(qchi, qn)
                tq4 = qrun_prop(qchi, 4 * qn)
                qslopes.append((tq4 - tq1) / (3 * qn))
            qt_step = max(float(np.median(qslopes)), 1e-9)

            # bf16-coefficient propagation at 0.25 degree (halved
            # coefficient stream traffic through the same loop).
            try:
                qc16 = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), qcoeffs
                )
                jax.block_until_ready(qc16)
                qrun_prop(qchi, qn, qc16)
                qrun_prop(qchi, 4 * qn, qc16)
                q16slopes = []
                for _ in range(2):
                    tq1 = qrun_prop(qchi, qn, qc16)
                    tq4 = qrun_prop(qchi, 4 * qn, qc16)
                    q16slopes.append((tq4 - tq1) / (3 * qn))
                qt16_step = max(float(np.median(q16slopes)), 1e-9)
                print(
                    f"# 0.25-degree bf16-coef step (in-loop): "
                    f"{qt16_step*1e3:.2f} ms ({1/qt16_step:.0f} steps/s)",
                    file=sys.stderr,
                )
                qc16 = None
            except Exception as e:
                print(f"# 0.25-degree bf16 step unavailable: {e}",
                      file=sys.stderr)

            qcoeffs = None  # assembly chain rebuilds the operator itself

            @partial(jax.jit, static_argnums=4)
            def q_asm_chain(u, v, m, g, n):
                def body(i, carry):
                    t = assemble_T_pallas(u, v, m * (1.0 + 1e-12 * carry), g)
                    return t.diag[0, 0, 0]

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            float(q_asm_chain(qumo, qvmo, qml, qgm, 2))
            float(q_asm_chain(qumo, qvmo, qml, qgm, 8))
            qjit = np.float32(1.0 + 1e-4 * np.random.default_rng().random())
            tq1, tq4 = [], []
            for rep in range(2):
                m1 = qml * (qjit * np.float32(1.0 + 1e-5 * (2 * rep + 1)))
                t0 = time.perf_counter()
                float(q_asm_chain(qumo, qvmo, m1, qgm, 2))
                tq1.append(time.perf_counter() - t0)
                m4 = qml * (qjit * np.float32(1.0 + 1e-5 * (2 * rep + 2)))
                t0 = time.perf_counter()
                float(q_asm_chain(qumo, qvmo, m4, qgm, 8))
                tq4.append(time.perf_counter() - t0)
            qt_asm = max((min(tq4) - min(tq1)) / 6, 1e-9)
            qcells = qnx * qny * qnz
            print(
                f"# 0.25-degree ({qnx}x{qny}x{qnz}) j-blocked: assembly "
                f"{qt_asm*1e3:.1f} ms ({qcells/qt_asm/1e9:.1f} G pts/s), "
                f"f32 step {qt_step*1e3:.2f} ms ({1/qt_step:.0f} steps/s)",
                file=sys.stderr,
            )

            # Full 0.25-degree ideal-age steady state with MIXED-
            # PRECISION refinement: f32 BiCGStab passes through the
            # host-CHUNKED Krylov (fori_loop chunks of the j-blocked
            # matvec; while_loop + that kernel crashes the worker at
            # production iteration counts) wrapped in f64 defect
            # correction — the f32-only solve floors at ~1e-3 relative
            # residual here, refinement reaches the requested 1e-5. The
            # retry ladder ends at the f32-only chunked solve (x64 off,
            # no refinement), which ALWAYS reports a number; every
            # failure prints its full traceback (round-3 lesson: the
            # swallowed exception type hid a Mosaic compile bug for a
            # whole round). The reference's headline workload needed
            # ~3 min on a 4x-COARSENED 1-degree matrix; this is the
            # uncoarsened quarter-degree grid. Runs LAST in this
            # section: a TPU-worker fault here must not cost the lines
            # above.
            import traceback as _tb

            def _print_failure(label, exc):
                print(f"# 0.25-degree {label} failed — full error:",
                      file=sys.stderr)
                for ln in _tb.format_exc(limit=12).splitlines()[-14:]:
                    print(f"#   {ln}", file=sys.stderr)

            try:
                qcoeffs = jax.jit(
                    lambda g, w, u, v, m: assemble_transport(u, v, m, g, w).T
                )(qgm, qwet, qumo, qvmo, qml)
                jax.block_until_ready(qcoeffs)
                # Free the build inputs: the f64 refinement state at this
                # size needs the ~3 GB they hold.
                qgm = qumo = qvmo = qml = qchi = None
                def _stats_lines(st, label):
                    for i, p in enumerate(st.get("passes", [])):
                        extra = ""
                        if p.get("inner_iters") is not None:
                            extra = (
                                f", inner {p['inner_iters']} iters -> "
                                f"{p.get('inner_stop')} (end rel "
                                f"{p.get('inner_end_rel'):.2e})")
                        rev = " [reverted]" if p.get("reverted") else ""
                        print(f"#   {label} pass {i}: defect rel "
                              f"{p['rel_start']:.2e}{rev}{extra}",
                              file=sys.stderr)

                rq = None
                qst = {}
                try:
                    jax.config.update("jax_enable_x64", True)
                    impl_used = "refined chunked-pallas"
                    t0 = time.perf_counter()
                    gamma_q, res_q = otmb.ideal_age(
                        qcoeffs, qwet, qtopo, tol=1e-5,
                        apply_impl="pallas", refine=True, stats=qst,
                    )
                    rq = float(res_q)
                    tq_age = time.perf_counter() - t0
                except Exception as e:
                    _print_failure("refined chunked-pallas age", e)
                finally:
                    jax.config.update("jax_enable_x64", False)
                if rq is None:
                    # Final rung: the f32-only chunked solve (x64 off) —
                    # the configuration that has always completed on this
                    # hardware; floors near 1e-3 but reports a number.
                    impl_used = "f32-only chunked-pallas"
                    qst = {}
                    t0 = time.perf_counter()
                    gamma_q, res_q = otmb.ideal_age(
                        qcoeffs, qwet, qtopo, tol=1e-3,
                        apply_impl="pallas", refine=False, stats=qst,
                    )
                    rq = float(res_q)
                    tq_age = time.perf_counter() - t0
                mean_q = float(jnp.nanmean(gamma_q)) / (86400 * 365.25)
                print(
                    f"# 0.25-degree ideal-age steady state (f32 Krylov + "
                    f"f64 defect correction, {impl_used} matvec): "
                    f"{tq_age:.1f} s incl. compile, rel residual "
                    f"{rq:.1e}, mean age {mean_q:.1f} yr",
                    file=sys.stderr,
                )
                _stats_lines(qst, "0.25-degree age")
                gamma_q = None

                # bf16-COEFFICIENT refined solve (round-4 verdict #5):
                # same composition, the 7 coefficient streams at half
                # width; the f64 defect correction converges against the
                # bf16-rounded operator (correctness pinned by
                # test_ir_bf16_narrow_coefficients).
                try:
                    qc16 = jax.tree_util.tree_map(
                        lambda x: x.astype(jnp.bfloat16), qcoeffs
                    )
                    jax.block_until_ready(qc16)
                    q16st = {}
                    jax.config.update("jax_enable_x64", True)
                    try:
                        t0 = time.perf_counter()
                        g16, r16 = otmb.ideal_age(
                            qc16, qwet, qtopo, tol=1e-5,
                            apply_impl="pallas", refine=True, stats=q16st,
                        )
                        r16f = float(r16)
                        t16 = time.perf_counter() - t0
                    finally:
                        jax.config.update("jax_enable_x64", False)
                    m16 = float(jnp.nanmean(g16)) / (86400 * 365.25)
                    print(
                        f"# 0.25-degree ideal-age bf16-coefficient "
                        f"refined: {t16:.1f} s incl. compile, rel "
                        f"residual {r16f:.1e}, mean age {m16:.1f} yr",
                        file=sys.stderr,
                    )
                    _stats_lines(q16st, "0.25-degree bf16 age")
                    g16 = qc16 = None
                except Exception as e:
                    _print_failure("bf16-coefficient refined age", e)

                # Batched fractions at 0.25 degree: fixed-iteration
                # throughput of the chunked BATCHED Krylov (the
                # water_mass_fractions engine at this size) vs the
                # single-RHS chunked solver. R=2 keeps the batched
                # Krylov working set (~9 grid vectors per member)
                # inside 16 GB HBM alongside the coefficients.
                try:
                    from otmb_tpu.models.solvers import (
                        solve_shifted_chunked,
                        solve_shifted_chunked_multi,
                    )

                    R, q_iters = 2, 150
                    qny_f, qnx_f = qwet.shape[1:]
                    qsurf = jnp.where(
                        qwet,
                        jnp.zeros(qwet.shape, jnp.float32).at[0].set(1.0),
                        0.0,
                    )
                    qmask = np.zeros((R, qny_f, qnx_f), bool)
                    qmask[0, : qny_f // 2] = True
                    qmask[1, qny_f // 2:] = True
                    qbs = jnp.where(
                        jnp.asarray(qwet)[None] & jnp.asarray(qmask)[:, None],
                        qsurf[None], 0.0,
                    )
                    # Warm-up (compile) then fixed-work timing, REPEATED:
                    # round-4 verdict weak #2 — the single-shot number
                    # swung 57% between runs and flipped the README
                    # row's qualitative claim. Median + spread over 3
                    # runs makes the row reproducible at the claims
                    # channel's tolerance.
                    reps = 3
                    solve_shifted_chunked_multi(
                        qcoeffs, qbs, qtopo, extra_diag=qsurf, tol=1e-30,
                        maxiter=50, early_stop=False,
                    )
                    t_bats = []
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        xs_q, _ = solve_shifted_chunked_multi(
                            qcoeffs, qbs, qtopo, extra_diag=qsurf,
                            tol=1e-30, maxiter=q_iters, early_stop=False,
                        )
                        jax.block_until_ready(xs_q)
                        t_bats.append(time.perf_counter() - t0)
                        xs_q = None
                    solve_shifted_chunked(
                        qcoeffs, qbs[0], qtopo, extra_diag=qsurf, tol=1e-30,
                        maxiter=50, early_stop=False,
                    )
                    t_ones = []
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        x1_q, _ = solve_shifted_chunked(
                            qcoeffs, qbs[0], qtopo, extra_diag=qsurf,
                            tol=1e-30, maxiter=q_iters, early_stop=False,
                        )
                        jax.block_until_ready(x1_q)
                        t_ones.append(time.perf_counter() - t0)
                        x1_q = None
                    qbs = None
                    t_bat = float(np.median(t_bats))
                    t_one = float(np.median(t_ones))
                    spread = 100.0 * (max(t_bats) - min(t_bats)) / t_bat
                    print(
                        f"# 0.25-degree batched fractions (R={R}, chunked, "
                        f"{q_iters} iters, median of {reps}): {t_bat:.1f} s"
                        f" = {1e3 * t_bat / q_iters:.1f} ms/iter = "
                        f"{1e3 * t_bat / q_iters / R:.1f} ms/iter/tracer, "
                        f"spread {spread:.0f}% "
                        f"(single-RHS chunked median: "
                        f"{1e3 * t_one / q_iters:.1f} ms/iter)",
                        file=sys.stderr,
                    )
                except Exception as e:
                    _print_failure("batched fractions", e)
                qcoeffs = None
            except Exception as e:
                _print_failure("ideal-age section", e)
        except Exception as e:
            print(f"# 0.25-degree diagnostics unavailable: {e}",
                  file=sys.stderr)

    t_total = t_assembly + t_pallas
    value = ncells / t_total
    grid_name = "ACCESS 1° grid" if args.scale == "1deg" else "ACCESS-OM2 0.25° grid"

    if tee is not None:
        # Persist this run's diagnostics as the claims artifact and
        # check the README against it (round-3 lesson: a README perf row
        # with no backing artifact must not survive a bench run quietly).
        from pathlib import Path

        sys.stderr = tee.stream
        Path(__file__).resolve().parent.joinpath(
            "BENCH_LATEST.txt"
        ).write_text(tee.text())
        try:
            import bench_claims

            if bench_claims.check_readme() != 0:
                print(
                    "# WARNING: README perf table drifted from this run; "
                    "run `python bench.py --update-readme`",
                    file=sys.stderr,
                )
            else:
                print("# README perf table verified against this run",
                      file=sys.stderr)
        except SystemExit as e:
            print(f"# WARNING: README claims check failed: {e}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": f"grid-points/s operator assembly+apply on {grid_name}",
        "value": value,
        "unit": "grid-points/s",
        "vs_baseline": value / BASELINE_POINTS_PER_S,
    }))


if __name__ == "__main__":
    main()
