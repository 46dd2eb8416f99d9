"""Physics closures: equation of state (TEOS-10 polynomial, linear)."""

from .eos import linear_eos, rho_teos10, sigma0_teos10

__all__ = ["rho_teos10", "sigma0_teos10", "linear_eos"]
