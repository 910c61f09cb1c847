"""Hero-wavelength sampling (Wilkie et al. 2014 style, 4 stratified samples).

TPU-native counterpart of reference ``src/tracer/color/wavelength.rs``:
the wavelength state of a wavefront of N rays is a single (N, 4) array.
A "terminated" state (dispersion collapsed the path to one wavelength,
``wavelength.rs:76-82``) is encoded exactly like the reference: trailing
samples zeroed, and the pdf of the leading sample divided by 4.

All functions are shape-polymorphic: `lam` is (..., 4).
"""
from __future__ import annotations

import jax.numpy as jnp

from lumo_tpu.config import LAMBDA_MAX, LAMBDA_MIN, SPECTRUM_SAMPLES

# Integral of cosh^-2(0.0072 (λ - 538)) over [360, 830] (reference
# ``wavelength.rs:3-8``).
SAMPLE_VISIBLE_INTEGRAL = 253.819


def sample_one(u):
    """Importance-sample one wavelength from the visible-weighted cosh^-2
    distribution (reference ``wavelength.rs:56-60``).  Clamped into
    [LAMBDA_MIN, LAMBDA_MAX]: f32 rounding near u→0/1 can otherwise land
    ~4e-4nm outside, where every spectral pdf/table treats the sample as
    out-of-range (pdf 0 → masked 0/0 in downstream division VJPs)."""
    lam = 538.0 - 138.888889 * jnp.arctanh(
        0.85691062 - SAMPLE_VISIBLE_INTEGRAL * u * 0.0072)
    return jnp.clip(lam, LAMBDA_MIN, LAMBDA_MAX)


def sample(u):
    """Stratified hero-wavelength sample. u: (...) uniform in [0,1) →
    (..., 4) wavelengths (reference ``wavelength.rs:35-44``)."""
    u = jnp.asarray(u)
    i = jnp.arange(SPECTRUM_SAMPLES, dtype=u.dtype)
    v = u[..., None] + i / SPECTRUM_SAMPLES
    v = jnp.where(v > 1.0, v - 1.0, v)
    return sample_one(v)


def sample_uniform_one(u):
    return LAMBDA_MIN + u * (LAMBDA_MAX - LAMBDA_MIN)


def pdf_one(lam):
    """(reference ``wavelength.rs:60-66``)."""
    inside = (lam >= LAMBDA_MIN) & (lam <= LAMBDA_MAX)
    p = 1.0 / (SAMPLE_VISIBLE_INTEGRAL * jnp.cosh(0.0072 * (lam - 538.05)) ** 2)
    return jnp.where(inside, p, 0.0)


def is_terminated(lam):
    """(..., 4) → (...) bool: all trailing samples zero."""
    return jnp.all(lam[..., 1:] == 0.0, axis=-1)


def pdf(lam):
    """Per-sample pdf (..., 4); leading pdf scaled by 1/4 when terminated
    (reference ``wavelength.rs:24-33``)."""
    p = pdf_one(lam)
    term = is_terminated(lam)
    lead_scale = jnp.where(term, 1.0 / SPECTRUM_SAMPLES, 1.0)
    return p.at[..., 0].multiply(lead_scale)


def terminate(lam, do=True):
    """Zero the trailing samples (dispersive refraction collapses to the
    hero wavelength).  `do` may be a (...)-shaped bool mask."""
    do = jnp.asarray(do)
    keep = jnp.concatenate(
        [jnp.ones_like(lam[..., :1], dtype=bool),
         jnp.broadcast_to(~do[..., None], lam[..., 1:].shape)], axis=-1)
    return jnp.where(keep, lam, 0.0)


def leading(lam):
    return lam[..., 0]
