"""Textures: solid / checkerboard / marble (Perlin) / image / Mandelbrot.

TPU re-design of reference ``src/tracer/texture.rs`` + ``src/perlin.rs``:
the recursive ``Texture`` enum becomes an integer-tagged table.  Nested
checkerboards resolve iteratively (a fixed unroll replaces recursion);
image textures live in one flat atlas of uplift coefficients with
per-texture (offset, w, h), sampled by bilinear gather with wrap
(reference ``image.rs:99-130``); marble evaluates 6-octave Perlin
turbulence on-device with the 256-point gradient lattice.

Host side: the ``Textures`` registry accumulates definitions and packs the
device table.  Device side: ``albedo(tex, ids, lam, uv)`` returns spectral
samples (N, 4) for per-lane texture ids (-1 lanes get 1.0 — callers blend
with the material's solid spectra).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from lumo_tpu.color import uplift

TEX_SOLID, TEX_CHECKER, TEX_MARBLE, TEX_IMAGE, TEX_MANDELBROT = range(5)

CHECKER_DEPTH = 4         # max nesting of checkerboards
MARBLE_SCALE = 4.0        # reference ``texture.rs:6-14``
MARBLE_FREQ = 60.0
MARBLE_AMP = 20.0
MARBLE_OCTAVES = 6
MARBLE_GAIN = 0.5
MANDELBROT_DEPTH = 256    # reference ``texture.rs:17-21``
MANDELBROT_R2 = 64.0 ** 2
PERLIN_POINTS = 256


class Textures:
    """Host-side registry; ``pack()`` → device dict."""

    def __init__(self, seed: int = 0):
        self.rows = []            # dicts: kind, spec, child1, child2, scale, img
        self.images = []          # list of (H, W, 4) coeff arrays
        self.normal_images = []   # list of (H, W, 3) normal arrays
        rng = np.random.default_rng(seed)
        # Perlin lattice: uniform sphere gradients + per-axis permutations
        # (reference ``perlin.rs:31-46``)
        z = 1.0 - 2.0 * rng.uniform(size=PERLIN_POINTS)
        phi = 2.0 * np.pi * rng.uniform(size=PERLIN_POINTS)
        r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
        self.lattice = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
        self.perm = [rng.permutation(PERLIN_POINTS) for _ in range(3)]

    def _add(self, **kw) -> int:
        row = dict(kind=TEX_SOLID, spec=np.zeros(4), child1=-1, child2=-1,
                   scale=1.0, img=-1)
        row.update(kw)
        self.rows.append(row)
        return len(self.rows) - 1

    def _as_id(self, t) -> int:
        """Accept a texture id or a spectrum spec (becomes a SOLID row)."""
        if isinstance(t, (int, np.integer)):
            return int(t)
        return self.solid(t)

    def solid(self, spec) -> int:
        from lumo_tpu.scene.materials import _spec
        return self._add(kind=TEX_SOLID, spec=_spec(spec))

    def checkerboard(self, t1, t2, scale: float) -> int:
        return self._add(kind=TEX_CHECKER, child1=self._as_id(t1),
                         child2=self._as_id(t2), scale=float(scale))

    def marble(self, spec) -> int:
        from lumo_tpu.scene.materials import _spec
        return self._add(kind=TEX_MARBLE, spec=_spec(spec))

    def mandelbrot(self) -> int:
        return self._add(kind=TEX_MANDELBROT)

    def image(self, rgb_linear: np.ndarray) -> int:
        """Register an image texture from linear RGB (H, W, 3)."""
        coeffs = uplift.from_rgb(np.asarray(rgb_linear, np.float64))
        self.images.append(coeffs.astype(np.float32))
        return self._add(kind=TEX_IMAGE, img=len(self.images) - 1)

    def normal_map(self, normals: np.ndarray) -> int:
        """Register a normal map (H, W, 3) in [-1, 1]; returns a normal-map
        id (separate id space from albedo textures)."""
        self.normal_images.append(np.asarray(normals, np.float32))
        return len(self.normal_images) - 1

    def mean_rgb(self, tex_id: int) -> np.ndarray:
        """Host-side mean color of an image texture (for light power)."""
        row = self.rows[tex_id]
        if row["kind"] != TEX_IMAGE:
            return np.ones(3)
        img = self.images[row["img"]]
        lam = 360.0 + 5.0 * np.arange(95)
        x = (lam - 360.0) / 470.0
        c = img.reshape(-1, 4)
        t = c[:, 0:1] * x * x + c[:, 1:2] * x + c[:, 2:3]
        s = c[:, 3:4] * (0.5 + t / (2.0 * np.sqrt(1.0 + t * t)))
        return s.mean()

    def pack(self, dtype=np.float32):
        if not self.rows:
            return None
        n = len(self.rows)

        def flat_atlas(images, channels):
            offs, ws, hs = [], [], []
            chunks = []
            o = 0
            for im in images:
                h, w = im.shape[:2]
                offs.append(o)
                ws.append(w)
                hs.append(h)
                chunks.append(im.reshape(-1, channels))
                o += h * w
            if not chunks:
                return (np.zeros((1, channels), dtype), [0], [1], [1])
            return np.concatenate(chunks), offs, ws, hs

        atlas, offs, ws, hs = flat_atlas(self.images, 4)
        natlas, noffs, nws, nhs = flat_atlas(self.normal_images, 3)
        img_of = [self.rows[i]["img"] for i in range(n)]
        gi = lambda lst, d: np.asarray(
            [lst[img_of[i]] if img_of[i] >= 0 else d for i in range(n)], np.int32)
        return {
            "kind": jnp.asarray([r["kind"] for r in self.rows], jnp.int32),
            "spec": jnp.asarray(np.stack([r["spec"] for r in self.rows]), dtype),
            "child1": jnp.asarray([r["child1"] for r in self.rows], jnp.int32),
            "child2": jnp.asarray([r["child2"] for r in self.rows], jnp.int32),
            "scale": jnp.asarray([r["scale"] for r in self.rows], dtype),
            "img_ofs": jnp.asarray(gi(offs, 0)),
            "img_w": jnp.asarray(gi(ws, 1)),
            "img_h": jnp.asarray(gi(hs, 1)),
            "atlas": jnp.asarray(atlas, dtype),
            "natlas": jnp.asarray(natlas, dtype),
            "n_ofs": jnp.asarray(noffs, jnp.int32),
            "n_w": jnp.asarray(nws, jnp.int32),
            "n_h": jnp.asarray(nhs, jnp.int32),
            "lattice": jnp.asarray(self.lattice, dtype),
            "perm_x": jnp.asarray(self.perm[0], jnp.int32),
            "perm_y": jnp.asarray(self.perm[1], jnp.int32),
            "perm_z": jnp.asarray(self.perm[2], jnp.int32),
        }


# ---------------------------------------------------------------------------
# device-side evaluation

def _perlin(tex, p):
    """Perlin noise at points p (N, 3) (reference ``perlin.rs:48-108``)."""
    fl = jnp.floor(p)
    w = p - fl
    base = fl.astype(jnp.int32)
    sw = ((6.0 * w - 15.0) * w + 10.0) * w * w * w  # smootherstep
    acc = 0.0
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                ix = (base[..., 0] + i) % PERLIN_POINTS
                iy = (base[..., 1] + j) % PERLIN_POINTS
                iz = (base[..., 2] + k) % PERLIN_POINTS
                h = tex["perm_x"][ix] ^ tex["perm_y"][iy] ^ tex["perm_z"][iz]
                g = tex["lattice"][h]                       # (N, 3)
                idx = jnp.asarray([i, j, k], p.dtype)
                widx = 2.0 * sw * idx + 1.0 - sw - idx      # (N, 3)
                d = w - idx
                acc = acc + (widx[..., 0] * widx[..., 1] * widx[..., 2]
                             * jnp.sum(g * d, axis=-1))
    return acc


def _turbulence(tex, p):
    acc = 0.0
    pp = p
    for d in range(MARBLE_OCTAVES):
        acc = acc + (MARBLE_GAIN ** d) * jnp.abs(_perlin(tex, pp))
        pp = 2.0 * pp
    return acc


def _bilinear(tex, ids, uv, atlas, ofs_k, w_k, h_k):
    """Bilinear atlas gather with wrap (reference ``image.rs:99-130``)."""
    w = tex[w_k][ids]
    h = tex[h_k][ids]
    ofs = tex[ofs_k][ids]
    fw = w.astype(uv.dtype)
    fh = h.astype(uv.dtype)
    # uv wrap; v flipped (image rows top-down)
    x = (uv[..., 0] % 1.0) * (fw - 1.0)
    y = (1.0 - uv[..., 1] % 1.0) * (fh - 1.0)
    x0 = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    x1 = (x0 + 1) % jnp.maximum(w, 1)
    y1 = (y0 + 1) % jnp.maximum(h, 1)
    fx = x - x0.astype(uv.dtype)
    fy = y - y0.astype(uv.dtype)
    g = lambda yy, xx: atlas[jnp.clip(ofs + yy * w + xx, 0, atlas.shape[0] - 1)]
    v00, v01 = g(y0, x0), g(y0, x1)
    v10, v11 = g(y1, x0), g(y1, x1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def albedo(tex, ids, lam, uv, kinds=None):
    """Evaluate texture ids (N,) at wavelengths lam (N, 4) and uv (N, 2).
    Lanes with ids < 0 return 1.0.  `kinds` (static tuple) gates which
    branches are compiled — absent kinds cost nothing."""
    N = ids.shape[0]
    valid = ids >= 0
    ids_c = jnp.clip(ids, 0, tex["kind"].shape[0] - 1)
    if kinds is None:
        kinds = (TEX_SOLID, TEX_CHECKER, TEX_MARBLE, TEX_IMAGE, TEX_MANDELBROT)

    # resolve checkerboards (children evaluated at ORIGINAL uv,
    # reference ``texture.rs:66-72``)
    if TEX_CHECKER in kinds:
        for _ in range(CHECKER_DEPTH):
            kind = tex["kind"][ids_c]
            is_ch = kind == TEX_CHECKER
            uvs = uv * tex["scale"][ids_c][..., None]
            parity = (jnp.floor(uvs[..., 0])
                      + jnp.floor(uvs[..., 1])).astype(jnp.int32) % 2
            child = jnp.where(parity == 0, tex["child1"][ids_c],
                              tex["child2"][ids_c])
            ids_c = jnp.where(is_ch,
                              jnp.clip(child, 0, tex["kind"].shape[0] - 1), ids_c)

    kind = tex["kind"][ids_c]
    out = uplift.sample(tex["spec"][ids_c][..., None, :], lam)      # (N, 4)

    if TEX_MARBLE in kinds:
        uvw = jnp.abs(jnp.concatenate([uv, jnp.zeros((N, 1), uv.dtype)], -1))
        turb = _turbulence(tex, MARBLE_SCALE * uvw)
        marble_s = 1.0 - (0.5 + 0.5 * jnp.sin(MARBLE_FREQ * uvw[..., 0]
                                              + MARBLE_AMP * turb)) ** 6
        out = jnp.where(kind[..., None] == TEX_MARBLE,
                        out * marble_s[..., None], out)

    if TEX_IMAGE in kinds:
        coeffs = _bilinear(tex, ids_c, uv, tex["atlas"],
                           "img_ofs", "img_w", "img_h")
        v_image = uplift.sample(coeffs[..., None, :], lam)
        out = jnp.where(kind[..., None] == TEX_IMAGE, v_image, out)

    if TEX_MANDELBROT in kinds:
        # [-1.5, 0.5] × [-1, 1] (reference ``texture.rs:75-90``)
        cr = 2.0 * (uv[..., 0] - 0.75)
        ci = 2.0 * (uv[..., 1] - 0.5)

        def mb_body(_, zz):
            zr, zi = zz
            live = zr * zr + zi * zi < MANDELBROT_R2
            zr2 = zr * zr - zi * zi + cr
            zi2 = 2.0 * zr * zi + ci
            return (jnp.where(live, zr2, zr), jnp.where(live, zi2, zi))

        zr, zi = jax.lax.fori_loop(0, MANDELBROT_DEPTH, mb_body,
                                   (jnp.zeros(N, uv.dtype),
                                    jnp.zeros(N, uv.dtype)))
        inside = (zr * zr + zi * zi < MANDELBROT_R2)
        out = jnp.where(kind[..., None] == TEX_MANDELBROT,
                        jnp.where(inside[..., None], 1.0, 0.0), out)

    return jnp.where(valid[..., None], out, 1.0)


def normal_at(tex, nm_ids, uv):
    """Sample normal maps (tangent-space, [-1,1]) for lanes with
    nm_ids >= 0; others get (0, 0, 1)."""
    valid = nm_ids >= 0
    ids_c = jnp.clip(nm_ids, 0, tex["n_ofs"].shape[0] - 1)
    sub = {"img_ofs": tex["n_ofs"], "img_w": tex["n_w"], "img_h": tex["n_h"]}
    n = _bilinear(sub, ids_c, uv, tex["natlas"], "img_ofs", "img_w", "img_h")
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    z = jnp.zeros_like(n).at[..., 2].set(1.0)
    return jnp.where(valid[..., None], n, z)
