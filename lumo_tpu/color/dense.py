"""Densely sampled spectra (95 samples, 5nm steps over [360, 830] nm).

TPU-native counterpart of the reference's ``DenseSpectrum``
(``src/tracer/color/dense_spectrum.rs``): spectra are plain arrays with a
trailing 95-axis; sampling at hero wavelengths is a vectorized linear
interpolation, so a whole wavefront of rays samples a whole table of
spectra in one gather.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu.config import DENSE_SAMPLES, LAMBDA_MAX, LAMBDA_MIN

STEP = (LAMBDA_MAX - LAMBDA_MIN) / (DENSE_SAMPLES - 1)  # = 5nm

_DATA = os.path.join(os.path.dirname(__file__), "data", "spectra.npz")


@lru_cache(maxsize=1)
def _tables() -> dict:
    with np.load(_DATA) as d:
        return {k: d[k].astype(np.float64) for k in d.files}


def table(name: str) -> np.ndarray:
    """Named public data spectrum (95,) float64: CIE 1931 'X','Y','Z',
    illuminants 'A','D50','D65','F2','F7','CORNELL', materials
    'diamond_eta','glass_eta','mirror_eta','mirror_k'."""
    return _tables()[name]


# Integral of the CIE 1931 Y curve (reference ``color/xyz.rs:33``).
Y_INTEGRAL = 106.856895


def from_points(wavelengths, values) -> np.ndarray:
    """Resample piecewise-linear (λ, v) data onto the dense 5nm grid.

    Mirrors reference ``dense_spectrum.rs:34-66``: outside the given range
    the spectrum linearly falls to zero at the first grid point beyond it.
    """
    wavelengths = np.asarray(wavelengths, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    order = np.argsort(wavelengths, kind="stable")
    wavelengths, values = wavelengths[order], values[order]

    grid = LAMBDA_MIN + STEP * np.arange(DENSE_SAMPLES)
    out = np.zeros(DENSE_SAMPLES)
    for i, lam in enumerate(grid):
        b1 = np.searchsorted(wavelengths, lam, side="left")
        if b1 < len(wavelengths) and wavelengths[b1] == lam:
            out[i] = values[b1]
            continue
        l1, i1 = (lam, 0.0) if b1 == len(wavelengths) else (wavelengths[b1], values[b1])
        l0, i0 = (lam, 0.0) if b1 == 0 else (wavelengths[b1 - 1], values[b1 - 1])
        dl = l1 - l0
        if dl == 0.0:
            out[i] = i0
            continue
        x1 = (lam - l0) / dl
        out[i] = (1.0 - x1) * i0 + x1 * i1
    return out


def sample(values, lam):
    """Linearly interpolate dense spectra at wavelengths.

    values: (..., 95) spectra; lam: (...) wavelengths — either
    ``values.ndim == lam.ndim + 1`` (per-lane spectra) or ``values``
    broadcasts against ``lam[..., None]`` (a shared table, e.g. the CIE
    curves).  λ == 0 (terminated hero sample) yields 0, matching
    reference ``dense_spectrum.rs:80-83``.

    Linear interpolation is evaluated as a hat-basis contraction over the
    95-bin axis instead of endpoint gathers — per-element gathers from
    small tables explode ~1000x on the TPU backend, while the dense
    multiply-reduce fuses on the VPU.
    """
    values = jnp.asarray(values)
    lam = jnp.asarray(lam)
    x = (lam - LAMBDA_MIN) / STEP
    b = jnp.arange(DENSE_SAMPLES, dtype=values.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - b))
    out = jnp.sum(w * values, axis=-1)
    return jnp.where(lam == 0.0, 0.0, out)


def sample_rows(table, rows, lam):
    """Sample per-ray rows of a dense-spectrum table: table (M, 95),
    rows (N,) int, lam (N, 4) → (N, 4).

    TPU-native formulation: XLA lowers per-element gathers from small
    tables into full index-space expansions (measured ~1000x the useful
    traffic), so instead the row select is a one-hot matmul (MXU) and the
    5nm linear interpolation is a hat-function contraction — both fuse,
    and the backward pass w.r.t. the (differentiable) table is a clean
    transposed matmul instead of a scatter."""
    table = jnp.asarray(table)
    M = table.shape[0]
    onehot = jax.nn.one_hot(rows, M, dtype=table.dtype)          # (N, M)
    rowvals = onehot @ table                                      # (N, 95)
    x = (lam - LAMBDA_MIN) / STEP                                 # (N, 4)
    b = jnp.arange(DENSE_SAMPLES, dtype=table.dtype)
    # linear interp == hat-basis weights: max(0, 1 - |x - b|)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - b))         # (N, 4, 95)
    out = jnp.einsum("nkb,nb->nk", w, rowvals)
    return jnp.where(lam == 0.0, 0.0, out)


def to_xyz(values) -> np.ndarray:
    """Dense spectrum (…, 95) → CIE XYZ (…, 3) (host-side, float64).

    Reference ``dense_spectrum.rs:100-109``: plain dot with the CMFs over
    the 5nm grid divided by the Y integral.
    """
    v = np.asarray(values, dtype=np.float64)
    cmf = np.stack([table("X"), table("Y"), table("Z")], axis=-1)  # (95,3)
    return v @ cmf / Y_INTEGRAL
