"""Warps from the unit square to disks/hemispheres/spheres.

Counterpart of reference ``src/rng/maps.rs``; all functions are
vectorized over leading axes (u is (..., 2))."""
from __future__ import annotations

import jax.numpy as jnp

from lumo_tpu.geometry.onb import safe_sqrt

PI = jnp.pi


def square_to_disk(u):
    """Shirley-Chiu concentric square → disk (reference ``maps.rs:4-26``)."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe = lambda a, b: jnp.where(b == 0.0, 0.0, a / jnp.where(b == 0.0, 1.0, b))
    theta = jnp.where(use_x, PI / 4.0 * safe(oy, ox),
                      PI / 2.0 - PI / 4.0 * safe(ox, oy))
    zero = (ox == 0.0) & (oy == 0.0)
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return jnp.stack([x, y], axis=-1)


def square_to_cos_hemisphere(u):
    """Malley's method: concentric disk lifted to the z+ hemisphere
    (reference ``maps.rs:30-37``)."""
    d = square_to_disk(u)
    z = safe_sqrt(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2)
    return jnp.concatenate([d, z[..., None]], axis=-1)


def square_to_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
