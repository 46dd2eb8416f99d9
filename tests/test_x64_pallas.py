"""Regression tests for Pallas kernels under jax_enable_x64.

Round-3 postmortem: the 0.25-degree refined ideal-age solve (BENCH_r03)
died with a Mosaic compile failure — ``failed to legalize operation
'func.return'`` with operands ``(i64, i32, i32)`` — because the Thomas
preconditioner kernel's BlockSpec index map ``lambda j, i: (0, j, i)``
traced the literal ``0`` as a weak i64 once the f64 defect-correction
loop enabled x64 process-wide, while the program ids stayed i32. Mosaic
only runs on a real TPU, so interpret-mode CI cannot reproduce the
compile failure itself; these tests pin the fix at the layer CI can see:
every index map the kernels build must return uniformly-int32 values
under x64 (ops/pallas_util.py:index_map_i32), and the kernels must stay
numerically correct with x64 on (this suite runs with x64 enabled, see
conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from otmb_tpu.ops.pallas_util import index_map_i32


def test_index_map_i32_coerces_literals():
    assert jax.config.jax_enable_x64  # the failure mode needs x64 on
    fn = index_map_i32(lambda j, i: (0, j, i))

    def probe(j, i):
        out = fn(j, i)
        assert all(v.dtype == jnp.int32 for v in out)
        assert not any(v.weak_type for v in out)
        return out

    jax.eval_shape(probe, jax.ShapeDtypeStruct((), jnp.int32),
                   jax.ShapeDtypeStruct((), jnp.int32))


def test_index_map_i32_passthrough_values():
    fn = index_map_i32(lambda j, i: (0, j + 1, i))
    out = fn(jnp.int32(2), jnp.int32(5))
    assert [int(v) for v in out] == [0, 3, 5]


def test_tridiag_kernel_matches_jnp_scans_under_x64():
    """Bitwise parity of the fused Thomas kernel vs the jnp-scan
    preconditioner (the docstring promise in ops/tridiag_pallas.py),
    with x64 enabled — the exact config of the refined 0.25-degree
    solve that failed in round 3."""
    from otmb_tpu.models.solvers import _tridiag_preconditioner
    from otmb_tpu.ops.coeffs import StencilCoeffs
    from otmb_tpu.ops.tridiag_pallas import tridiag_solve_pallas

    rng = np.random.default_rng(7)
    nz, ny, nx = 9, 16, 256
    lo = jnp.asarray(-rng.uniform(0, 0.1, (nz, ny, nx)), jnp.float32)
    up = jnp.asarray(-rng.uniform(0, 0.1, (nz, ny, nx)), jnp.float32)
    di = jnp.asarray(1 + rng.uniform(0, 1, (nz, ny, nx)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(nz, ny, nx)), jnp.float32)

    coeffs = StencilCoeffs(
        diag=di, east=jnp.zeros_like(di), west=jnp.zeros_like(di),
        north=jnp.zeros_like(di), south=jnp.zeros_like(di),
        top=up, bottom=lo,
    )
    ref = _tridiag_preconditioner(coeffs, di)(b)
    guarded = jnp.where(di != 0, di, jnp.ones((), di.dtype))
    got = tridiag_solve_pallas(lo, guarded, up, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
