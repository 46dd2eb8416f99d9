"""otmb_tpu — TPU-native ocean transport-operator engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
OceanTransportMatrixBuilder.jl: ingest CMIP Arakawa C-grid mass
transports and grid metrics, close the six-face cell fluxes by mass
conservation, and assemble the advection-diffusion transport operator
T = Tadv + TkH + TkVML + TkVdeep as dense stencil coefficients applied
matrix-free on TPU.

Public API mirrors the reference exports
(src/OceanTransportMatrixBuilder.jl:31-36).
"""

from .config import TransportConfig
from .grid.geometry import GridMetrics, makegridmetrics
from .grid.indices import Indices, as2d, as3d, makeindices, wet_vector
from .grid.topology import GridTopology, detect_topology
from .models.transport import (
    TransportOperators,
    buildTadv,
    buildTkH,
    buildTkVdeep,
    buildTkVML,
    transportmatrix,
)
from .ops.apply import apply_stencil, apply_stencil_transpose, operator_diagnostics
from .ops.coeffs import StencilCoeffs, add_coeffs
from .ops.fluxes import FaceFluxes, facefluxes, facefluxesfrommasstransport
from .utils.sparse_export import coeffs_to_scipy
from .utils.synthetic import synthetic_dataset

__version__ = "0.1.0"

__all__ = [
    "TransportConfig",
    "GridMetrics",
    "makegridmetrics",
    "Indices",
    "makeindices",
    "wet_vector",
    "as2d",
    "as3d",
    "GridTopology",
    "detect_topology",
    "TransportOperators",
    "transportmatrix",
    "buildTadv",
    "buildTkH",
    "buildTkVML",
    "buildTkVdeep",
    "apply_stencil",
    "apply_stencil_transpose",
    "operator_diagnostics",
    "StencilCoeffs",
    "add_coeffs",
    "FaceFluxes",
    "facefluxes",
    "facefluxesfrommasstransport",
    "coeffs_to_scipy",
    "synthetic_dataset",
]
