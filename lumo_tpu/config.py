"""Global configuration for the lumo_tpu renderer.

The reference (ekarpp/lumo ``src/lib.rs:55-67``) renders in f64 with
``EPSILON = 1e-10``.  TPUs have no fast f64, so the production path is f32
with the robustness tricks (watertight intersections, error-bound ray
offsets) ported faithfully; a float64 CPU run of the *same* code serves as
the quality reference.  Enable it with ``use_f64()`` (requires
``jax_enable_x64``).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# dtype control

_F64 = False


def use_f64(enable: bool = True) -> None:
    """Switch the renderer to float64 (CPU reference mode).

    Caller must also set ``jax.config.update('jax_enable_x64', True)``.
    """
    global _F64
    _F64 = enable


def float_dtype():
    return jnp.float64 if _F64 else jnp.float32


def np_float_dtype():
    return np.float64 if _F64 else np.float32


def epsilon() -> float:
    """Intersection epsilon; reference uses 1e-10 for f64, 1e-4 for f32
    (``src/lib.rs:61-67``)."""
    return 1e-10 if _F64 else 1e-4


# machine epsilon / 2 used for gamma error bounds (PBR §3.9)
def machine_eps_half() -> float:
    return float(np.finfo(np.float64 if _F64 else np.float32).eps) / 2.0


def gamma_bound(n: int) -> float:
    """PBR gamma(n) = n*e / (1 - n*e) floating point error bound
    (reference ``src/efloat.rs:5-8``)."""
    e = machine_eps_half()
    return n * e / (1.0 - n * e)


# ---------------------------------------------------------------------------
# spectral constants (reference ``src/tracer/color.rs:56-58``)

LAMBDA_MIN = 360.0
LAMBDA_MAX = 830.0
SPECTRUM_SAMPLES = 4       # hero wavelength + 3
DENSE_SAMPLES = 95         # every 5nm over [360, 830]

INF = float(np.inf)

# Transport mode tags (reference ``src/lib.rs:75-80``)
RADIANCE = 0
IMPORTANCE = 1
