"""Numerical debugging helpers.

The reference is serial Julia with inline NaN guards
(matrixbuilding.jl:39,61,90,114). Equivalents here (SURVEY section 5):
jax's NaN debugging mode plus an operator validator encoding the
reference test-suite's structural checks.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..grid.topology import GridTopology
from ..ops.apply import operator_diagnostics
from ..ops.coeffs import StencilCoeffs


def enable_nan_debugging(enable: bool = True) -> None:
    """Make jax raise on the first NaN produced inside jitted code
    (jax_debug_nans). Expensive; for debugging sessions only."""
    jax.config.update("jax_debug_nans", enable)


@dataclasses.dataclass(frozen=True)
class OperatorValidation:
    finite: bool
    diag_positive: bool  # diag > 0 on wet cells (upwind sign structure)
    offdiag_nonpositive: bool  # all neighbor legs <= 0
    land_zero: bool  # land cells carry exact zeros
    tau_div_s: float
    tau_vol_s: float

    @property
    def ok_upwind(self) -> bool:
        return (self.finite and self.diag_positive and self.offdiag_nonpositive
                and self.land_zero)


def validate_operator(
    coeffs: StencilCoeffs, v3d, wet3d, topology: GridTopology
) -> OperatorValidation:
    """Structural checks from the reference test-suite
    (test/online.jl:97-123): finiteness, upwind sign structure
    (diag > 0, off-diagonals < 0), exact zeros on land, and the
    divergence / volume-conservation timescales."""
    wet = np.asarray(wet3d, bool)
    arrays = {name: np.asarray(getattr(coeffs, name)) for name in coeffs._fields}

    finite = all(np.isfinite(a).all() for a in arrays.values())
    diag_positive = bool((arrays["diag"][wet] > 0).all())
    offdiag_nonpositive = all(
        bool((arrays[name][wet] <= 0).all())
        for name in coeffs._fields
        if name != "diag"
    )
    land_zero = all(bool((a[~wet] == 0).all()) for a in arrays.values())

    diags = operator_diagnostics(coeffs, v3d, wet3d, topology)
    return OperatorValidation(
        finite=finite,
        diag_positive=diag_positive,
        offdiag_nonpositive=offdiag_nonpositive,
        land_zero=land_zero,
        tau_div_s=float(diags["tau_div_s"]),
        tau_vol_s=float(diags["tau_vol_s"]),
    )
