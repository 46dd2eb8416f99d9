"""Native (C++) runtime components, compiled on demand.

The TPU compute path is JAX/XLA/Pallas; these are host-side cores for the
preprocessing/analysis loops where pure Python is orders of magnitude too
slow at production grid sizes. Each has a pure-Python fallback used both
when no compiler is available and as the semantics oracle in tests.
"""

from .build import load_library  # noqa: F401
