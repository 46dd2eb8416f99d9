"""Mechanized README perf-claims channel.

Every `python bench.py` run tees its stderr diagnostics to
`BENCH_LATEST.txt`. The README's performance table lives between
`<!-- BENCH_TABLE_BEGIN -->` / `<!-- BENCH_TABLE_END -->` markers and is
GENERATED from that file:

    python bench.py --update-readme   # regenerate the table in README.md
    python bench.py --check-readme    # exit 1 if the table has drifted

The default bench run finishes by running the check itself and printing
a loud warning on drift, so a README number that no bench artifact backs
cannot survive a round unnoticed (round-3 verdict: the one row that
mattered did exactly that).

Parsing is line-pattern based: each row spec extracts numbers from the
known stderr line formats of bench.py. A row whose source line is absent
from the latest run renders as "(not measured in latest run)" — visible,
never silently stale.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent
LATEST = ROOT / "BENCH_LATEST.txt"
README = ROOT / "README.md"
BEGIN = "<!-- BENCH_TABLE_BEGIN -->"
END = "<!-- BENCH_TABLE_END -->"

NUM = r"([-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?)"


def _strip_thousands(text):
    """Drop thousands separators ("10,199" -> "10199") before number
    parsing. The renderer emits them (`{tps:,.0f}`), and without this
    `_numbers` split such cells into fragments and compared garbage
    pairwise (the round-4 false-positive drift line)."""
    return re.sub(r"(?<=\d),(?=\d)", "", text)


def _grab(text, pattern):
    m = re.search(pattern, _strip_thousands(text))
    if m is None:
        return None
    return [float(g) for g in m.groups()]


def _fmt_us(v):
    return f"{v/1000:.2f} ms" if v >= 1000 else f"{v:.0f} µs"


def render_rows(text):
    """(label, time_cell, notes_cell) rows from the bench stderr text.

    Cells are fully derived from measured numbers plus fixed prose; a
    missing measurement renders explicitly as not-measured.
    """
    rows = []

    def add(label, vals, fmt, notes=""):
        if vals is None:
            rows.append((label, "*(not measured in latest run)*", notes))
        else:
            rows.append((label, fmt(*vals), notes))

    g = lambda p: _grab(text, p)

    add(
        "Pallas fused apply, standalone trace-verified (9 HBM streams)",
        g(rf"pallas apply standalone \(trace-verified on-device\): {NUM} us"
          rf" = {NUM} GB/s nominal / {NUM} GB/s physical \({NUM}%"),
        lambda us, nom, phys, pct: (
            f"{_fmt_us(us)} — {nom:.0f} GB/s nominal / **{phys:.0f} GB/s "
            f"physical = {pct:.0f}% of the measured DMA peak**"),
    )
    add(
        "Pallas fused Euler step, in a propagation loop",
        g(rf"pallas euler step \(in-loop\): {NUM} us, {NUM} steps/s"),
        lambda us, sps: f"{_fmt_us(us)} (~{sps:,.0f} steps/s)",
        "may beat its own HBM roofline: XLA pins the tracer carry and "
        "part of the coefficient streams in VMEM across loop iterations",
    )
    add(
        "Pallas step, bf16 coefficients, in-loop",
        g(rf"pallas euler step \(bf16 coefs, in-loop\): {NUM} us, "
          rf"{NUM} steps/s"),
        lambda us, sps: f"{_fmt_us(us)} (~{sps:,.0f} steps/s)",
        "coefficient streams halved; f32 tracer math in-register",
    )
    add(
        "Multi-tracer batched step (B=8), in-loop",
        g(rf"pallas multi-tracer euler step \(B=8, in-loop\): {NUM} us = "
          rf"{NUM} us/tracer \({NUM} tracer-steps/s, {NUM}x"),
        lambda us, per, tps, speed: (
            f"{_fmt_us(us)} = **{per:.0f} µs/tracer** "
            f"({tps:,.0f} tracer-steps/s)"),
        "coefficient streams shared across the batch: "
        "2 + 7/B HBM streams per tracer instead of 9",
    )
    add(
        "XLA-fused jnp step (baseline path)",
        g(rf"jnp euler step:\s+{NUM} us \({NUM} GB/s"),
        lambda us, bw: f"{_fmt_us(us)} ({bw:.0f} GB/s effective)",
    )
    add(
        "Fused Pallas assembly (raw transports → all four operators)",
        g(rf"assembly: {NUM} ms \({NUM} G grid-points/s\)"),
        lambda ms, gps: f"{ms:.2f} ms ({gps:.1f} G grid-points/s)",
        "in-chain, including stream preparation",
    )
    add(
        "Fused Redi step (19-pt isoneutral), in-loop",
        g(rf"pallas redi step \(19-pt isoneutral\): {NUM} us \({NUM} "
          rf"steps/s\)"),
        lambda us, sps: f"{_fmt_us(us)} (~{sps:,.0f} steps/s)",
        "17 streams; tracer slabs carried in VMEM (chi fetched once, "
        "not 3×)",
    )
    add(
        "Fused Redi step, bf16 coefficients, in-loop",
        g(rf"pallas redi step \(bf16 coefs, in-loop\): {NUM} us \({NUM} "
          rf"steps/s\)"),
        lambda us, sps: f"{_fmt_us(us)} (~{sps:,.0f} steps/s)",
        "`redi_operator_to_bf16`",
    )
    add(
        "Multi-tracer Redi step (B=8), in-loop",
        g(rf"pallas redi multi-tracer step \(B=8, in-loop\): {NUM} us = "
          rf"{NUM} us/tracer \({NUM} tracer-steps/s"),
        lambda us, per, tps: (
            f"{_fmt_us(us)} = **{per:.0f} µs/tracer** "
            f"({tps:,.0f} tracer-steps/s)"),
        "15 coefficient streams shared across the batch",
    )
    add(
        "Ideal-age steady state, 1° full resolution, f64-refined",
        g(rf"ideal-age steady state \(full resolution, f64-refined\): "
          rf"{NUM} s, rel residual {NUM}"),
        lambda s, res: f"{s:.2f} s to {res:.1e} relative residual",
        "vs ~3 min for the reference's direct solve on a 4×-coarsened "
        "matrix (MacBook Air M2, test/local_full.jl:165)",
    )
    add(
        "Batched water-mass fractions (R=4), 1°, one lockstep solve",
        g(rf"batched water-mass fractions \(R=4, 1-degree\): {NUM} s, "
          rf"max rel residual {NUM}"),
        lambda s, res: f"{s:.2f} s for all 4 regions, residuals ≤ "
                       f"{res:.0e}",
        "`water_mass_fractions`: one batched Krylov, shared coefficient "
        "streams",
    )
    add(
        "0.25° apply, standalone trace-verified (1440×1080×75, "
        "j-blocked kernel)",
        g(rf"0\.25-degree pallas apply standalone \(trace-verified\): "
          rf"f32 {NUM} us = {NUM} GB/s physical \({NUM}%"),
        lambda us, phys, pct: (
            f"{_fmt_us(us)} — **{phys:.0f} GB/s physical = {pct:.0f}% of "
            f"the DMA peak**"),
    )
    add(
        "0.25° apply, bf16 coefficients, standalone trace-verified",
        g(rf"0\.25-degree pallas apply standalone \(trace-verified\): "
          rf"bf16 coefs {NUM} us = {NUM} GB/s physical \({NUM}%"),
        lambda us, phys, pct: (
            f"{_fmt_us(us)} — {phys:.0f} GB/s physical = {pct:.0f}% of "
            f"the DMA peak"),
    )
    add(
        "0.25° propagation loop, bf16 coefficients",
        g(rf"0\.25-degree bf16-coef step \(in-loop\): {NUM} ms \({NUM} "
          rf"steps/s\)"),
        lambda ms, sps: f"{ms:.2f} ms ({sps:.0f} steps/s)",
        "kernel-emitted halo rows, single-use carry — no per-step copies",
    )
    add(
        "0.25° assembly + f32 propagation step",
        g(rf"0\.25-degree \(1440x1080x75\) j-blocked: assembly {NUM} ms "
          rf"\({NUM} G pts/s\), f32 step {NUM} ms \({NUM} steps/s\)"),
        lambda ams, gps, sms, sps: (
            f"assembly {ams:.1f} ms ({gps:.1f} G pts/s); step "
            f"{sms:.2f} ms ({sps:.0f} steps/s)"),
    )
    add(
        "0.25° ideal-age steady state, uncoarsened",
        g(rf"0\.25-degree ideal-age steady state [^:]*: {NUM} s incl\. "
          rf"compile, rel residual {NUM}"),
        lambda s, res: f"**{s:.0f} s incl. compile, to {res:.0e} "
                       f"relative residual**",
        "f32 chunked Pallas Krylov + f64 defect correction; the f32-only "
        "solve floors near 1e-3. Reference: ~3 min for a 4×-coarsened 1° "
        "matrix — this is 36× the cell count, uncoarsened",
    )
    add(
        "0.25° ideal-age, bf16-coefficient refined",
        g(rf"0\.25-degree ideal-age bf16-coefficient refined: {NUM} s "
          rf"incl\. compile, rel residual {NUM}"),
        lambda s, res: f"{s:.0f} s incl. compile, to {res:.0e} "
                       f"relative residual",
        "coefficient streams at half width; f64 defect correction "
        "converges against the bf16-rounded operator",
    )
    add(
        "0.25° batched fractions (R=2), chunked batched Krylov",
        g(rf"0\.25-degree batched fractions \(R=2, chunked, {NUM} "
          rf"iters, median of {NUM}\): {NUM} s = {NUM} ms/iter = "
          rf"{NUM} ms/iter/tracer, spread {NUM}% "
          rf"\(single-RHS chunked median: {NUM} ms/iter\)"),
        lambda n, reps, s, mpi, mpt, spread, single: (
            f"{mpt:.1f} ms/iter/tracer (median of {reps:.0f}, spread "
            f"{spread:.0f}%) vs {single:.1f} ms/iter single-RHS — "
            f"{single/mpt:.2f}× per tracer"),
        "fixed-work throughput; the per-tracer ratio is whatever the "
        "median measurement says (it has swung both sides of 1.0 "
        "run-to-run at this size, hence the published spread)",
    )
    return rows


def render_table(text):
    lines = [
        "| Path | measured | notes |",
        "|---|---|---|",
    ]
    for label, cell, notes in render_rows(text):
        lines.append(f"| {label} | {cell} | {notes} |")
    return "\n".join(lines)


def _readme_sections():
    readme = README.read_text()
    try:
        pre, rest = readme.split(BEGIN, 1)
        cur, post = rest.split(END, 1)
    except ValueError:
        raise SystemExit(
            f"README.md lacks {BEGIN}/{END} markers around the perf table"
        )
    return pre, cur.strip("\n"), post


def update_readme() -> None:
    if not LATEST.exists():
        raise SystemExit(f"{LATEST} not found — run `python bench.py` first")
    table = render_table(LATEST.read_text())
    pre, _, post = _readme_sections()
    README.write_text(f"{pre}{BEGIN}\n{table}\n{END}{post}")
    print(f"README.md perf table regenerated from {LATEST.name}")


def _numbers(cell):
    return [float(x) for x in re.findall(NUM, _strip_thousands(cell))]


def _close(a, b):
    """Benchmark-noise-tolerant comparison: 25% of the smaller magnitude
    for ordinary values (kernel timings fluctuate a few %, long solves
    up to ~15% run-to-run), one order of magnitude for tiny values
    (residuals, which only matter to their exponent)."""
    if a == b:
        return True
    import math

    if max(abs(a), abs(b)) < 1e-2:
        if min(abs(a), abs(b)) == 0:
            return False
        return abs(math.log10(abs(a) / abs(b))) <= 1.0
    if min(abs(a), abs(b)) == 0:
        return False
    return abs(a - b) <= 0.25 * min(abs(a), abs(b))


def check_readme() -> int:
    """0 if the README table's numbers match the latest bench artifact
    (within benchmark noise), 1 on drift — a claimed row whose backing
    measurement is absent, extra/missing rows, or any number off by more
    than noise."""
    if not LATEST.exists():
        print(f"WARNING: {LATEST} not found; cannot check README claims",
              file=sys.stderr)
        return 1
    expected = render_table(LATEST.read_text()).splitlines()
    _, current, _ = _readme_sections()
    current = [l for l in current.splitlines() if l.strip()]
    drift = []
    if len(current) != len(expected):
        drift.append(
            f"row count: README has {len(current)} lines, expected "
            f"{len(expected)}"
        )
    for cur, exp in zip(current, expected):
        cur_cells = [c.strip() for c in cur.strip("|").split("|")]
        exp_cells = [c.strip() for c in exp.strip("|").split("|")]
        label = exp_cells[0]
        if cur_cells[0] != label:
            drift.append(f"row label {cur_cells[0]!r} != {label!r}")
            continue
        if len(cur_cells) < 2 or len(exp_cells) < 2:
            continue
        cm, em = cur_cells[1], exp_cells[1]
        if ("not measured" in cm) != ("not measured" in em):
            drift.append(f"{label}: measured-ness differs "
                         f"({cm!r} vs {em!r})")
            continue
        cn, en = _numbers(cm), _numbers(em)
        if len(cn) != len(en):
            drift.append(f"{label}: {len(cn)} numbers in README vs "
                         f"{len(en)} expected ({cm!r} vs {em!r})")
            continue
        for a, b in zip(cn, en):
            if not _close(a, b):
                drift.append(f"{label}: {a:g} vs measured {b:g}")
    if not drift:
        return 0
    print("README perf table DRIFTED from the latest bench artifact "
          "(run `python bench.py --update-readme`):", file=sys.stderr)
    for d in drift:
        print(f"  - {d}", file=sys.stderr)
    return 1
