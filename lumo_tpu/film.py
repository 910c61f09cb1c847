"""Film: filter-weighted sample accumulation via scatter-add, splat buffer
for light-traced (BDPT) samples, tone mapping, PNG output.

Counterpart of reference ``src/tracer/{film,filter}.rs`` +
``src/tone_mapping.rs``.  The reference rasterizes each sample's filter
footprint into per-thread tiles; here the whole wavefront scatter-adds
into the film with a statically unrolled (2r+1)² footprint loop —
spectral → RGB conversion happens at sample time exactly like
``film/tile.rs:65-111`` (XYZ → white balance → RGB, then filter weights).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu.color import dense, space

# filter kinds
SQUARE, TRIANGLE, GAUSSIAN, MITCHELL = range(4)

_TINY = 1e-30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PixelFilter:
    radius: Any
    sigma: Any      # gaussian σ or mitchell b
    kind: int = dataclasses.field(metadata=dict(static=True))
    r_disc: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def make(kind=GAUSSIAN, radius=1.5, sigma=None):
        if sigma is None:
            sigma = radius / 4.0 if kind == GAUSSIAN else (1.0 / 3.0)
        r_disc = int(math.ceil(radius - 0.5))
        return PixelFilter(radius=jnp.float32(radius), sigma=jnp.float32(sigma),
                           kind=kind, r_disc=r_disc)

    @staticmethod
    def square(radius=0.5):
        return PixelFilter.make(SQUARE, radius)

    @staticmethod
    def gaussian(radius=1.5, sigma=None):
        return PixelFilter.make(GAUSSIAN, radius, sigma)

    @staticmethod
    def triangle(radius=1.0):
        return PixelFilter.make(TRIANGLE, radius)

    @staticmethod
    def mitchell(radius=2.0, b=1.0 / 3.0):
        return PixelFilter.make(MITCHELL, radius, b)


def _gauss(x, sigma):
    return jnp.exp(-x * x / (2.0 * sigma * sigma)) / jnp.sqrt(2.0 * jnp.pi * sigma * sigma)


def _mitch(x, b):
    c = (1.0 - b) / 2.0
    ax = jnp.abs(x)
    p1 = ((12.0 - 9.0 * b - 6.0 * c) * ax ** 3
          + (-18.0 + 12.0 * b + 6.0 * c) * ax ** 2 + (6.0 - 2.0 * b))
    p2 = ((-b - 6.0 * c) * ax ** 3 + (6.0 * b + 30.0 * c) * ax ** 2
          + (-12.0 * b - 48.0 * c) * ax + (8.0 * b + 24.0 * c))
    return jnp.where(ax < 1.0, p1, jnp.where(ax < 2.0, p2, 0.0)) / 6.0


def filter_eval(filt: PixelFilter, v):
    """Filter weight at offset v (..., 2) (reference ``filter.rs:80-101``)."""
    x, y = v[..., 0], v[..., 1]
    r = filt.radius
    if filt.kind == SQUARE:
        return jnp.where((jnp.abs(x) < r) & (jnp.abs(y) < r), 1.0, 0.0)
    if filt.kind == TRIANGLE:
        ox = jnp.maximum(r - jnp.abs(x), 0.0)
        oy = jnp.maximum(r - jnp.abs(y), 0.0)
        return ox * oy
    if filt.kind == GAUSSIAN:
        gr = _gauss(r, filt.sigma)
        return (jnp.maximum(_gauss(x, filt.sigma) - gr, 0.0)
                * jnp.maximum(_gauss(y, filt.sigma) - gr, 0.0))
    return _mitch(2.0 * x / r, filt.sigma) * _mitch(2.0 * y / r, filt.sigma)


def filter_integral(filt: PixelFilter) -> float:
    """Closed-form ∫∫ filter (reference ``filter.rs:104-117``)."""
    r = float(filt.radius)
    s = float(filt.sigma)
    if filt.kind == SQUARE:
        return 4.0 * r * r
    if filt.kind == TRIANGLE:
        return r ** 4
    if filt.kind == MITCHELL:
        return r * r * 0.25
    denom = s * math.sqrt(2.0)
    ig = 0.5 * (math.erf(r / denom) - math.erf(-r / denom))
    gr = float(_gauss(jnp.float32(r), jnp.float32(s)))
    return (ig - 2.0 * r * gr) ** 2


# ---------------------------------------------------------------------------
# tone mapping (reference ``tone_mapping.rs:38-64``)

NOMAP, CLAMP, REINHARD = range(3)
_TM_NAMES = {"nomap": NOMAP, "none": NOMAP, "clamp": CLAMP,
             "reinhard": REINHARD}

# debug radiance sanitizer (reference ``tone_mapping.rs:9,42-56``)
SUSPICIOUSLY_LARGE_VALUE = 1000.0


def tone_map_kind(kind):
    """Normalize a tone-map spec (int constant or name string) to an int."""
    if isinstance(kind, str):
        return _TM_NAMES[kind.lower()]
    kind = int(kind)
    if kind not in (NOMAP, CLAMP, REINHARD):
        raise ValueError(f"unknown tone map {kind}")
    return kind


def tone_map(kind, color, lam, arg=1.0, debug=False):
    """Tone-map spectral samples.  With ``debug=True``, estimator bugs are
    *painted* instead of scrubbed (reference debug build,
    ``tone_mapping.rs:42-56``): NaN → green, negative → red, suspiciously
    large → blue, each at 32x brightness so they glow in the output."""
    kind = tone_map_kind(kind)
    if kind == NOMAP:
        out = color
    elif kind == CLAMP:
        out = jnp.clip(color, 0.0, arg)
    else:
        lum = space.luminance(color, lam)
        out = color / (1.0 + lum[..., None])
    if debug:
        from lumo_tpu.color import uplift
        nan = jnp.any(~jnp.isfinite(color), axis=-1)
        neg = jnp.any(color < 0.0, axis=-1)
        huge = jnp.max(color, axis=-1) > SUSPICIOUSLY_LARGE_VALUE
        paint = {name: 32.0 * uplift.sample(
                     jnp.asarray(uplift.from_rgb(rgb), color.dtype)[None, :],
                     lam)
                 for name, rgb in (("g", [0, 1, 0]), ("r", [1, 0, 0]),
                                   ("b", [0, 0, 1]))}
        out = jnp.where(nan[..., None], paint["g"],
              jnp.where(neg[..., None], paint["r"],
              jnp.where(huge[..., None], paint["b"], out)))
    return out


# ---------------------------------------------------------------------------
# film accumulation

def new_film(resolution, dtype=jnp.float32):
    """(color (H, W, 3), weight (H, W), splat (H, W, 3)) accumulators."""
    w, h = resolution
    return (jnp.zeros((h, w, 3), dtype), jnp.zeros((h, w), dtype),
            jnp.zeros((h, w, 3), dtype))


def add_samples(film, filt: PixelFilter, raster_xy, rgb, resolution,
                splat=False, mask=None):
    """Scatter a wavefront of RGB samples through the pixel filter.

    film: (color, weight, splat) triplet; raster_xy (N, 2); rgb (N, 3).
    The (2r+1)² filter footprint loop is unrolled statically (r_disc ≤ 2
    for all stock filters).
    """
    color, weight, splats = film
    w_res, h_res = resolution
    px = jnp.floor(raster_xy).astype(jnp.int32)
    if mask is None:
        mask = jnp.ones(raster_xy.shape[:-1], bool)
    r = filt.r_disc
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            fx = px[..., 0] + dx
            fy = px[..., 1] + dy
            mid = jnp.stack([fx.astype(raster_xy.dtype) + 0.5,
                             fy.astype(raster_xy.dtype) + 0.5], axis=-1)
            wgt = filter_eval(filt, raster_xy - mid)
            inb = (fx >= 0) & (fx < w_res) & (fy >= 0) & (fy < h_res) & mask
            wgt = jnp.where(inb, wgt, 0.0)
            fx_c = jnp.clip(fx, 0, w_res - 1)
            fy_c = jnp.clip(fy, 0, h_res - 1)
            if splat:
                splats = splats.at[fy_c, fx_c].add(wgt[..., None] * rgb)
            else:
                color = color.at[fy_c, fx_c].add(wgt[..., None] * rgb)
                weight = weight.at[fy_c, fx_c].add(wgt)
    return (color, weight, splats)


def spectral_to_rgb(color4, lam, xyz_to_rgb_wb):
    """Spectral sample → linear RGB at sample time (``tile.rs:66``)."""
    return space.to_rgb(color4, lam, xyz_to_rgb_wb)


def finalize(film, filt: PixelFilter, splat_scale: float):
    """pixels/weight + splats·scale/∫filter → linear RGB image (H, W, 3)
    (reference ``film.rs:173-192``)."""
    color, weight, splats = film
    direct = color / jnp.maximum(weight[..., None], _TINY)
    return direct + splats * (splat_scale / filter_integral(filt))


def save_png(rgb_linear: np.ndarray, path: str, colorspace="sRGB"):
    """Encode with the color space transfer curve and write a PNG."""
    from PIL import Image
    cs = space.get(colorspace)
    img = cs.encode(np.asarray(rgb_linear))
    Image.fromarray(img, "RGB").save(path)


def wb_matrix(colorspace: str, illuminant: str | np.ndarray) -> np.ndarray:
    """Fused (XYZ→RGB)·(Von Kries WB) matrix for the film."""
    cs = space.get(colorspace)
    illum = dense.table(illuminant) if isinstance(illuminant, str) else illuminant
    return cs.xyz_to_rgb @ cs.wb_matrix(illum)
