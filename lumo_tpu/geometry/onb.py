"""Orthonormal bases and shading-space helpers, vectorized over wavefronts.

Counterpart of reference ``src/tracer/onb.rs`` (Duff et al. 2017 branchless
ONB) and ``src/math/spherical_utils.rs`` — here every function maps
(N, 3) direction batches.
"""
from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x, eps=1e-24):
    """sqrt with a gradient-safe floor: sqrt'(0) = inf would poison
    reverse-mode AD through masked branches (double-where problem)."""
    return jnp.sqrt(jnp.maximum(x, eps))


def normalize(v, eps=0.0):
    n = safe_sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, eps if eps else jnp.finfo(v.dtype).tiny)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def onb_frame(w):
    """Duff et al. 2017 branchless ONB from unit normal w (..., 3) →
    (u, v) tangent vectors (..., 3) each."""
    z = w[..., 2]
    sgn = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sgn + z)
    b = w[..., 0] * w[..., 1] * a
    u = jnp.stack([1.0 + sgn * w[..., 0] ** 2 * a, sgn * b, -sgn * w[..., 0]], axis=-1)
    v = jnp.stack([b, sgn + w[..., 1] ** 2 * a, -w[..., 1]], axis=-1)
    return u, v


def to_local(w, vec):
    """World direction → shading space with normal w as +z."""
    u, v = onb_frame(w)
    return jnp.stack([dot(vec, u), dot(vec, v), dot(vec, w)], axis=-1)


def to_world(w, vec):
    u, v = onb_frame(w)
    return vec[..., 0:1] * u + vec[..., 1:2] * v + vec[..., 2:3] * w


# --- spherical utils in shading space (z-up) ---

def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] ** 2


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w):
    return safe_sqrt(sin2_theta(w))


def tan2_theta(w):
    c2 = cos2_theta(w)
    return sin2_theta(w) / jnp.maximum(c2, jnp.finfo(w.dtype).tiny)


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.where(s == 0.0, 1.0, s), -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.where(s == 0.0, 1.0, s), -1.0, 1.0))


def same_hemisphere(a, b):
    return cos_theta(a) * cos_theta(b) > 0.0


def reflect_z(wo):
    """Mirror reflection about +z."""
    return jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
