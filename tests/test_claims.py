"""The mechanized README perf-claims channel (bench_claims.py).

Round-3 postmortem: README.md claimed a 243 s / 3e-7 0.25-degree solve
while the driver bench recorded that exact workload failing — a claim
with no backing artifact survived a round. These tests pin the machinery
that makes that impossible: the README table is generated from
BENCH_LATEST.txt and `--check-readme` fails on drift, missing
measurements, or structural mismatch.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench_claims  # noqa: E402

SAMPLE = """
# pallas apply standalone (trace-verified on-device): 288 us = 674 GB/s nominal / 728 GB/s physical (100% of the measured DMA peak)
# pallas euler step (in-loop): 192 us, 5200 steps/s, blah
# pallas euler step (bf16 coefs, in-loop): 86 us, 11624 steps/s (2260 GB/s)
# pallas multi-tracer euler step (B=8, in-loop): 799 us = 100 us/tracer (10015 tracer-steps/s, 1.9x the single-tracer step)
# jnp euler step:    416 us (468 GB/s effective)
# assembly: 0.54 ms (9.91 G grid-points/s)
# ideal-age steady state (full resolution, f64-refined): 1.44 s, rel residual 2.19e-11, mean age 0.9 yr
# batched water-mass fractions (R=4, 1-degree): 9.26 s, max rel residual 1.6e-06
# 0.25-degree ideal-age steady state (f32 Krylov + f64 defect correction, refined chunked-pallas matvec): 169.6 s incl. compile, rel residual 5.9e-06, mean age 0.5 yr
# 0.25-degree ideal-age bf16-coefficient refined: 88.1 s incl. compile, rel residual 3.2e-06, mean age 0.5 yr
# 0.25-degree batched fractions (R=2, chunked, 150 iters, median of 3): 16.8 s = 112.3 ms/iter = 56.2 ms/iter/tracer, spread 9% (single-RHS chunked median: 63.6 ms/iter)
"""


@pytest.fixture
def claims_env(tmp_path, monkeypatch):
    latest = tmp_path / "BENCH_LATEST.txt"
    latest.write_text(SAMPLE)
    readme = tmp_path / "README.md"
    readme.write_text(
        "# header\n\n"
        f"{bench_claims.BEGIN}\n| Path | measured | notes |\n|---|---|---|\n"
        f"{bench_claims.END}\n\ntail\n"
    )
    monkeypatch.setattr(bench_claims, "LATEST", latest)
    monkeypatch.setattr(bench_claims, "README", readme)
    return latest, readme


def test_rows_parse_measured_lines():
    rows = bench_claims.render_rows(SAMPLE)
    by_label = {r[0]: r[1] for r in rows}
    assert "288 µs" in by_label[
        "Pallas fused apply, standalone trace-verified (9 HBM streams)"
    ]
    assert "170 s" in by_label["0.25° ideal-age steady state, uncoarsened"]
    # a metric absent from the artifact renders visibly as not-measured
    assert any("not measured" in r[1] for r in rows)


def test_update_then_check_passes(claims_env):
    bench_claims.update_readme()
    assert bench_claims.check_readme() == 0


def test_check_catches_numeric_drift(claims_env, capsys):
    bench_claims.update_readme()
    _, readme = claims_env
    readme.write_text(
        readme.read_text().replace("**170 s incl. compile",
                                   "**243 s incl. compile")
    )
    assert bench_claims.check_readme() == 1
    assert "243" in capsys.readouterr().err


def test_check_catches_missing_measurement(claims_env):
    bench_claims.update_readme()
    latest, _ = claims_env
    # next run fails to measure the 0.25-degree solve: claim must not
    # silently survive
    latest.write_text(SAMPLE.replace(
        "# 0.25-degree ideal-age steady state", "# (solve failed)"
    ))
    assert bench_claims.check_readme() == 1


def test_check_tolerates_benchmark_noise(claims_env):
    bench_claims.update_readme()
    latest, _ = claims_env
    latest.write_text(
        SAMPLE.replace("288 us", "301 us").replace("169.6 s", "181.0 s")
        .replace("rel residual 5.9e-06", "rel residual 8.8e-06")
    )
    assert bench_claims.check_readme() == 0


def test_thousands_separators_not_split(claims_env):
    """Round-4 postmortem: the renderer emits thousands separators
    ("10,015 tracer-steps/s") but NUM had no comma handling, so
    `_numbers` split such cells into fragments and compared garbage
    pairwise — flagging a 784-vs-812 µs agreement as "199 vs 849"
    drift, and potentially masking real drift by misaligning lists."""
    assert bench_claims._numbers("10,015 tracer-steps/s") == [10015.0]
    bench_claims.update_readme()
    latest, _ = claims_env
    # within-noise change that crosses a thousands boundary: must PASS
    latest.write_text(SAMPLE.replace(
        "100 us/tracer (10015 tracer-steps/s",
        "103 us/tracer (9684 tracer-steps/s",
    ))
    assert bench_claims.check_readme() == 0
    # genuine 3x drift in a comma-rendered number: must FAIL
    latest.write_text(SAMPLE.replace(
        "100 us/tracer (10015 tracer-steps/s",
        "300 us/tracer (3338 tracer-steps/s",
    ))
    assert bench_claims.check_readme() == 1


def test_residuals_compared_by_exponent(claims_env):
    bench_claims.update_readme()
    latest, _ = claims_env
    # 5.9e-06 claimed but only 3e-4 achieved: two orders -> drift
    latest.write_text(SAMPLE.replace("rel residual 5.9e-06",
                                     "rel residual 3.1e-04"))
    assert bench_claims.check_readme() == 1
