"""Spectral uplift: RGB → sigmoid-polynomial reflectance spectra.

The reference ships a 9.4MB precomputed ``srgb.coeff`` table (Jakob &
Hanika 2019, loaded in ``src/tracer/color/spectrum/tables.rs``) that is
missing from the mounted snapshot.  We regenerate an equivalent table from
scratch with a vectorized Gauss-Newton fit (host-side numpy, a few
seconds, cached to disk).

A spectrum is (c0, c1, c2, scale):  s(λ) = scale · S(c0·x² + c1·x + c2)
with S(t) = 1/2 + t / (2·sqrt(1+t²)) and x = (λ-360)/470 (normalized
wavelength — better f32 conditioning than raw nanometres; the coefficient
basis differs from the reference but the represented spectra match).

Fit criterion: the D65-weighted CIE XYZ of s, converted to linear sRGB,
must reproduce the input RGB — the same criterion as the original rgb2spec
generator.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from lumo_tpu.color import dense, space
from lumo_tpu.config import LAMBDA_MAX, LAMBDA_MIN

RES = 64  # table resolution per axis
_CACHE = os.path.join(os.path.dirname(__file__), "data", f"uplift_srgb_{RES}.npz")

_X_SCALE = 1.0 / (LAMBDA_MAX - LAMBDA_MIN)


def _sigmoid(t):
    return 0.5 + t / (2.0 * np.sqrt(1.0 + t * t))


def _sigmoid_grad(t):
    return 0.5 / np.power(1.0 + t * t, 1.5)


def _smoothstep(x):
    return x * x * (3.0 - 2.0 * x)


@lru_cache(maxsize=1)
def _fit_basis():
    """(A, xs): A maps a 95-sample spectrum to linear sRGB under D65;
    xs are the normalized wavelengths of the dense grid."""
    lam = LAMBDA_MIN + dense.STEP * np.arange(dense.DENSE_SAMPLES)
    xs = (lam - LAMBDA_MIN) * _X_SCALE
    d65 = dense.table("D65")
    cmf = np.stack([dense.table("X"), dense.table("Y"), dense.table("Z")])  # (3,95)
    xyz_of = cmf * d65[None, :]                     # spectrum -> XYZ (unnormalized)
    norm = 1.0 / (d65 @ dense.table("Y"))           # white -> Y=1
    A = space.get("sRGB").xyz_to_rgb @ (xyz_of * norm)  # (3,95)
    return A, xs


def _fit_slice(c_init, targets, iters=18):
    """Gauss-Newton fit of (P,3) coefficient rows against (P,3) RGB targets."""
    A, xs = _fit_basis()
    basis = np.stack([xs * xs, xs, np.ones_like(xs)])  # (3,95)
    c = c_init.copy()
    for _ in range(iters):
        poly = c @ basis                     # (P,95)
        s = _sigmoid(poly)
        resid = s @ A.T - targets            # (P,3)
        g = _sigmoid_grad(poly)              # (P,95)
        # J[p, out, k] = sum_i A[out,i] * g[p,i] * basis[k,i]
        J = np.einsum("oi,pi,ki->pok", A, g, basis)
        # damped solve for stability at saturated sigmoids
        JtJ = np.einsum("pok,pol->pkl", J, J)
        Jtr = np.einsum("pok,po->pk", J, resid)
        JtJ += 1e-12 * np.eye(3)[None]
        c = c - np.linalg.solve(JtJ, Jtr[..., None])[..., 0]
    return c


@lru_cache(maxsize=1)
def table() -> dict:
    """The fitted uplift table: {'coeffs': (3, RES, RES, RES, 3),
    'scale': (RES,)} — axes [maxc, z, y, x]."""
    if os.path.exists(_CACHE):
        with np.load(_CACHE) as d:
            return {"coeffs": d["coeffs"], "scale": d["scale"]}

    scale_nodes = _smoothstep(_smoothstep(np.arange(RES) / (RES - 1)))
    xg, yg = np.meshgrid(np.arange(RES) / (RES - 1),
                         np.arange(RES) / (RES - 1), indexing="xy")
    # targets per maxc at brightness z: rgb[maxc]=z, [maxc+1]=x z, [maxc+2]=y z
    coeffs = np.zeros((3, RES, RES, RES, 3))
    for maxc in range(3):
        c = np.zeros((RES * RES, 3))
        mid = RES // 2
        for ks in [range(mid, RES), range(mid - 1, -1, -1)]:
            ks = list(ks)
            c = coeffs[maxc, mid].reshape(-1, 3).copy() if ks[0] != mid else np.zeros((RES * RES, 3))
            for k in ks:
                z = scale_nodes[k]
                rgb = np.zeros((RES * RES, 3))
                rgb[:, maxc] = z
                rgb[:, (maxc + 1) % 3] = xg.ravel() * z
                rgb[:, (maxc + 2) % 3] = yg.ravel() * z
                c = _fit_slice(c, rgb)
                coeffs[maxc, k] = c.reshape(RES, RES, 3)
    out = {"coeffs": coeffs.astype(np.float32), "scale": scale_nodes.astype(np.float32)}
    os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
    np.savez_compressed(_CACHE, **out)
    return out


def from_rgb(rgb) -> np.ndarray:
    """Linear RGB (..., 3) → spectrum coefficients (..., 4) = (c0, c1, c2,
    scale).  Host-side; vectorized trilinear table lookup (reference
    ``spectrum.rs:49-74`` + ``tables.rs:29-85``)."""
    rgb = np.atleast_2d(np.asarray(rgb, dtype=np.float64))
    shape = rgb.shape
    rgb = rgb.reshape(-1, 3)
    t = table()
    coeffs_t, scale_nodes = t["coeffs"].astype(np.float64), t["scale"].astype(np.float64)

    maxc = np.argmax(rgb, axis=-1)
    mx = rgb[np.arange(len(rgb)), maxc]
    black = mx <= 0.0
    mx_safe = np.where(black, 1.0, mx)

    # HDR values: fold brightness >1 into the scale term (reference
    # ``spectrum.rs:55-59`` uses 2*max)
    scale_mult = np.where(mx > 1.0, 2.0 * mx, 1.0)
    xn = rgb[np.arange(len(rgb)), (maxc + 1) % 3] / mx_safe
    yn = rgb[np.arange(len(rgb)), (maxc + 2) % 3] / mx_safe
    zn = np.clip(mx / scale_mult, 0.0, 1.0)

    x = np.clip(xn, 0.0, 1.0) * (RES - 1)
    y = np.clip(yn, 0.0, 1.0) * (RES - 1)
    xi = np.minimum(x.astype(np.int64), RES - 2)
    yi = np.minimum(y.astype(np.int64), RES - 2)
    zi = np.clip(np.searchsorted(scale_nodes, zn, side="right") - 1, 0, RES - 2)
    x1 = x - xi
    y1 = y - yi
    dz = scale_nodes[zi + 1] - scale_nodes[zi]
    z1 = np.where(dz > 0, (zn - scale_nodes[zi]) / np.where(dz > 0, dz, 1.0), 0.0)

    out = np.zeros((len(rgb), 3))
    for dzi in (0, 1):
        for dyi in (0, 1):
            for dxi in (0, 1):
                w = (np.where(dzi, z1, 1 - z1)
                     * np.where(dyi, y1, 1 - y1)
                     * np.where(dxi, x1, 1 - x1))
                out += w[:, None] * coeffs_t[maxc, zi + dzi, yi + dyi, xi + dxi]

    res = np.concatenate([out, scale_mult[:, None]], axis=-1)
    res[black] = 0.0
    return res.reshape(shape[:-1] + (4,))


def sample(coeffs, lam):
    """Device-side: spectrum coefficients (..., 4) sampled at wavelengths
    `lam` (...,) → values (...,).  λ == 0 (terminated) yields 0."""
    coeffs = jnp.asarray(coeffs)
    x = (lam - LAMBDA_MIN) * _X_SCALE
    t = coeffs[..., 0] * x * x + coeffs[..., 1] * x + coeffs[..., 2]
    s = 0.5 + t / (2.0 * jnp.sqrt(1.0 + t * t))
    return jnp.where(lam == 0.0, 0.0, coeffs[..., 3] * s)


def from_srgb8(r, g, b) -> np.ndarray:
    """8-bit sRGB → spectrum coefficients (reference ``spectrum.rs:39-43``)."""
    u = np.array([r, g, b], dtype=np.float64) / 255.0
    lin = np.where(u <= 0.04045, u / 12.92, np.power((u + 0.055) / 1.055, 2.4))
    return from_rgb(lin)


def from_points(pts: str) -> np.ndarray:
    """Parse "λ:v λ:v …" → dense spectrum → XYZ → sRGB → coefficients
    (reference ``spectrum.rs:81-100``)."""
    pairs = []
    for tok in pts.split():
        lam_s, v_s = tok.split(":")
        pairs.append((float(lam_s), float(v_s)))
    pairs.sort()
    ds = dense.from_points([p[0] for p in pairs], [p[1] for p in pairs])
    xyz = dense.to_xyz(ds)
    rgb = space.get("sRGB").xyz_to_rgb @ xyz
    return from_rgb(rgb)


BLACK = np.zeros(4)


def white() -> np.ndarray:
    return from_rgb([1.0, 1.0, 1.0])
