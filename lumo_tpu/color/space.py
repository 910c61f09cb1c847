"""Color spaces, XYZ conversion, Von Kries white balance.

TPU-native counterpart of reference ``src/tracer/color/{space,xyz}.rs``.
Matrices are computed host-side in float64 numpy; per-sample spectral →
RGB conversion is vectorized over whole wavefronts.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from lumo_tpu.color import dense, wavelength

# ---------------------------------------------------------------------------
# XYZ helpers (host-side)


def from_xyY(xy, Y=1.0) -> np.ndarray:
    x, y = float(xy[0]), float(xy[1])
    if y == 0.0:
        return np.zeros(3)
    return np.array([x * Y / y, Y, (1.0 - x - y) * Y / y])


def to_xyY(xyz) -> np.ndarray:
    s = float(xyz[0] + xyz[1] + xyz[2])
    return np.array([xyz[0] / s, xyz[1] / s])


# Stockman & Sharpe 2000 XYZ↔LMS (reference ``space.rs:117-127``)
XYZ_TO_LMS = np.array([
    [0.210576, 0.855098, -0.0396983],
    [-0.417076, 1.177260, 0.0786283],
    [0.0, 0.0, 0.5168350],
])
LMS_TO_XYZ = np.linalg.inv(XYZ_TO_LMS)


def _xyz_to_rgb_matrix(r_xy, g_xy, b_xy, W) -> np.ndarray:
    """RGB primaries + white point → XYZ→RGB matrix
    (reference ``space.rs:162-177``)."""
    R, G, B = from_xyY(r_xy), from_xyY(g_xy), from_xyY(b_xy)
    RGB_c = np.stack([R, G, B], axis=-1)  # columns
    C = np.linalg.solve(RGB_c, W)
    return np.linalg.inv(RGB_c @ np.diag(C))


class ColorSpace:
    """A named RGB color space with an XYZ→RGB matrix, white point and
    transfer curve ('srgb' or 'rec2020')."""

    def __init__(self, name, xyz_to_rgb, white, trc):
        self.name = name
        self.xyz_to_rgb = xyz_to_rgb
        self.white = white
        self.trc = trc

    # --- transfer curves (reference ``space.rs:3-33``) ---
    def encode(self, rgb: np.ndarray) -> np.ndarray:
        """Linear RGB (..., 3) in [0, ∞) → uint8 via the transfer curve."""
        c = np.asarray(rgb, dtype=np.float64)
        if self.trc == "srgb":
            ec = np.where(c <= 0.0031308, 12.92 * c,
                          1.055 * np.power(np.maximum(c, 0.0), 1.0 / 2.4) - 0.055)
        else:  # rec2020
            beta = 0.018053968510807
            alpha = 1.0 + 5.5 * beta
            ec = np.where(c <= beta, 4.5 * c,
                          alpha * np.power(np.maximum(c, 0.0), 0.45) - (alpha - 1.0))
        # round-to-nearest (the reference truncates; rounding is strictly
        # more accurate and differs by at most 1 ULP of u8)
        return np.clip(np.rint(ec * 255.0), 0.0, 255.0).astype(np.uint8)

    def wb_matrix(self, illuminant: np.ndarray) -> np.ndarray:
        """Von Kries chromatic adaptation in LMS for a camera `illuminant`
        dense spectrum (reference ``space.rs:143-151``)."""
        illum_xy = to_xyY(dense.to_xyz(illuminant))
        diag = (XYZ_TO_LMS @ self.white) / (XYZ_TO_LMS @ from_xyY(illum_xy))
        return LMS_TO_XYZ @ np.diag(diag) @ XYZ_TO_LMS


_W_D65 = None


def _w_d65():
    global _W_D65
    if _W_D65 is None:
        _W_D65 = from_xyY(to_xyY(dense.to_xyz(dense.table("D65"))))
    return _W_D65


@lru_cache(maxsize=None)
def get(name: str = "DCI-P3") -> ColorSpace:
    W = _w_d65()
    if name == "sRGB":
        m = _xyz_to_rgb_matrix((0.64, 0.33), (0.3, 0.6), (0.15, 0.06), W)
        return ColorSpace(name, m, W, "srgb")
    if name == "DCI-P3":  # default, reference ``space.rs:50-54``
        m = _xyz_to_rgb_matrix((0.68, 0.32), (0.265, 0.69), (0.15, 0.06), W)
        return ColorSpace(name, m, W, "srgb")
    if name == "Rec2020":
        m = _xyz_to_rgb_matrix((0.708, 0.292), (0.170, 0.797), (0.131, 0.046), W)
        return ColorSpace(name, m, W, "rec2020")
    raise ValueError(name)


# ---------------------------------------------------------------------------
# device-side spectral → XYZ/RGB (vectorized over wavefronts)

def _cmf_tables(dtype):
    return (jnp.asarray(dense.table("X"), dtype),
            jnp.asarray(dense.table("Y"), dtype),
            jnp.asarray(dense.table("Z"), dtype))


def luminance(color, lam):
    """Color (..., 4) + wavelengths (..., 4) → luminance (...)
    (reference ``color.rs:91-95``)."""
    _, Y, _ = _cmf_tables(color.dtype)
    pdf = wavelength.pdf(lam)
    y = dense.sample(Y, lam)
    # double-where: pdf == 0 (λ rounded outside [360, 830]) must be
    # sanitized BEFORE the division or its transpose computes 0/0 = NaN
    ok = pdf > 0.0
    pdf_safe = jnp.where(ok, pdf, 1.0)
    contrib = jnp.where(ok, y * color / pdf_safe, 0.0)
    return jnp.mean(contrib, axis=-1) / dense.Y_INTEGRAL


def to_xyz(color, lam):
    """Color (..., 4) sampled at λ (..., 4) → XYZ (..., 3)
    (reference ``color.rs:98-107``)."""
    X, Y, Z = _cmf_tables(color.dtype)
    pdf = wavelength.pdf(lam)
    # double-where (see luminance): the round-4 flagship NaN-grad bug —
    # a hero wavelength of 359.99957nm (f32 rounding below LAMBDA_MIN)
    # made pdf 0 and the masked division's transpose 0/0 = NaN,
    # poisoning every material-table gradient
    ok = pdf > 0.0
    pdf_safe = jnp.where(ok, pdf, 1.0)
    w = jnp.where(ok, color / pdf_safe, 0.0)
    out = jnp.stack([
        jnp.mean(dense.sample(X, lam) * w, axis=-1),
        jnp.mean(dense.sample(Y, lam) * w, axis=-1),
        jnp.mean(dense.sample(Z, lam) * w, axis=-1),
    ], axis=-1)
    return out / dense.Y_INTEGRAL


def to_rgb(color, lam, xyz_to_rgb_wb):
    """Spectral color → linear RGB through a fused (XYZ→RGB)·(WB) matrix."""
    xyz = to_xyz(color, lam)
    return xyz @ jnp.asarray(xyz_to_rgb_wb, color.dtype).T
