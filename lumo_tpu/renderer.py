"""Renderer driver: builds the pjit'd render step and accumulates the film.

Counterpart of the reference's builder-pattern ``Renderer``
(``src/renderer.rs``): configuration (samples/integrator/seed/sampler/
tone-map/filter) plus ``render()``.  Where the reference publishes 16×16
tiles × 256-sample batches to a thread pool, the TPU design compiles ONE
wavefront step covering the whole image × a sample sub-batch and iterates
it, scatter-adding into a device-resident film.  Multi-chip execution
shards the same step over a mesh (``lumo_tpu.parallel``).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu import film as film_mod
from lumo_tpu.camera import Camera
from lumo_tpu.color import wavelength
from lumo_tpu.integrators import bdpt, direct_light, path_trace
from lumo_tpu.sampling import samplers
from lumo_tpu.scene.scene import SceneData

PATH_TRACE = "path"
DIRECT_LIGHT = "direct"
BD_PATH_TRACE = "bdpt"


class Renderer:
    """``Renderer(scene, camera).samples(512).render()``"""

    def __init__(self, scene: SceneData, camera: Camera):
        self.scene = scene
        self.camera = camera
        self._samples = 1
        self._integrator = PATH_TRACE
        self._seed = 0
        self._sampler = samplers.MULTI_JITTERED
        self._tone_map = film_mod.NOMAP
        self._tone_arg = 1.0
        self._filter = film_mod.PixelFilter.gaussian()
        self._colorspace = "DCI-P3"
        self._illuminant = "D65"
        self._batch = None  # samples per compiled step (auto)
        self._delta = 1.0   # RR threshold
        self._debug = False  # paint NaN/neg/huge radiance (tone_mapping.rs:42-56)

    # fluent config (mirrors reference ``renderer.rs:66-99``)
    def samples(self, n):
        self._samples = int(n)
        return self

    def integrator(self, name):
        self._integrator = name
        return self

    def seed(self, s):
        self._seed = int(s)
        return self

    def sampler(self, s):
        self._sampler = s
        return self

    def tone_map(self, kind, arg=1.0):
        self._tone_map = film_mod.tone_map_kind(kind)
        self._tone_arg = arg
        return self

    def debug_sanitize(self, on=True):
        """Paint NaN (green) / negative (red) / huge (blue) radiance in the
        output instead of scrubbing it — surfaces estimator bugs
        (reference debug builds, ``tone_mapping.rs:42-56``)."""
        self._debug = bool(on)
        return self

    def pixel_filter(self, f):
        self._filter = f
        return self

    def colorspace(self, cs):
        self._colorspace = cs
        return self

    def illuminant(self, name):
        self._illuminant = name
        return self

    def batch_samples(self, n):
        self._batch = int(n)
        return self

    # ------------------------------------------------------------------
    def _auto_batch(self):
        if self._batch is not None:
            return max(1, min(self._batch, self._samples))
        w, h = self.camera.resolution
        # target ~2M rays per step
        per = max(1, int(2_000_000 / max(w * h, 1)))
        return max(1, min(per, self._samples))

    def _make_step(self, spp_batch, total_spp):
        scene = self.scene
        camera = self.camera
        filt = self._filter
        sampler_kind = self._sampler
        tone_kind = self._tone_map
        tone_arg = self._tone_arg
        if self._integrator == PATH_TRACE:
            integrator = functools.partial(path_trace.integrate, delta=self._delta)
        elif self._integrator == DIRECT_LIGHT:
            integrator = direct_light.integrate
        elif self._integrator == BD_PATH_TRACE:
            integrator = None  # handled inline below (returns splats too)
        else:
            raise ValueError(f"unknown integrator {self._integrator}")
        is_bdpt = self._integrator == BD_PATH_TRACE
        w, h = camera.resolution
        wbm = jnp.asarray(film_mod.wb_matrix(self._colorspace, self._illuminant),
                          jnp.float32)
        delta = self._delta
        debug = self._debug

        @jax.jit
        def step(film, key, sample_base):
            n_pix = w * h
            pix = jnp.arange(n_pix, dtype=jnp.uint32)
            px = (pix % w).astype(jnp.float32)
            py = (pix // w).astype(jnp.float32)
            # (spp_batch, n_pix) wavefronts flattened
            sidx = (sample_base + jnp.arange(spp_batch, dtype=jnp.uint32))[:, None]
            pixb = jnp.broadcast_to(pix[None, :], (spp_batch, n_pix))
            offs = samplers.pixel_offsets(sampler_kind, sidx * jnp.uint32(1) +
                                          jnp.zeros_like(pixb), total_spp,
                                          pixb, self._seed)
            raster = jnp.stack([px[None, :] + offs[..., 0],
                                py[None, :] + offs[..., 1]], axis=-1)
            raster = raster.reshape(-1, 2)
            N = raster.shape[0]

            k_lam, k_dof, k_int = jax.random.split(key, 3)
            u_lam = samplers._randfloat(
                pixb.reshape(-1), jnp.uint32(self._seed * 7919 + 13) ^
                (sidx * jnp.uint32(0x9E3779B9) + jnp.zeros_like(pixb)).reshape(-1))
            lam = wavelength.sample(u_lam)
            u_dof = jax.random.uniform(k_dof, (N, 2))
            o, d = camera.generate_ray(raster, u_dof)

            if is_bdpt:
                radiance, lam_out, sr, sc, sm, depth = bdpt.integrate(
                    scene, camera, o, d, lam, k_int, delta=delta)
            else:
                radiance, lam_out, depth = integrator(scene, o, d, lam, k_int)
            color = film_mod.tone_map(tone_kind, radiance, lam_out, tone_arg,
                                      debug=debug)
            rgb = film_mod.spectral_to_rgb(color, lam_out, wbm)
            film = film_mod.add_samples(film, filt, raster, rgb, (w, h))
            if is_bdpt and sr.shape[0]:
                # light-traced splats land at their own raster coords
                # (reference ``film/tile.rs:96-111``)
                reps = sr.shape[0] // N
                lam_s = jnp.tile(lam_out, (reps, 1))
                sc = film_mod.tone_map(tone_kind, sc, lam_s, tone_arg,
                                       debug=debug)
                rgb_s = film_mod.spectral_to_rgb(sc, lam_s, wbm)
                film = film_mod.add_samples(film, filt, sr, rgb_s, (w, h),
                                            splat=True, mask=sm)
            rays = jnp.sum(depth) + N
            return film, rays

        return step

    def render(self, verbose=True):
        """Render and return the linear-RGB image (H, W, 3) numpy array."""
        w, h = self.camera.resolution
        spp_batch = self._auto_batch()
        step = self._make_step(spp_batch, self._samples)
        film = film_mod.new_film((w, h))
        key = jax.random.PRNGKey(self._seed)
        total_rays = 0
        t0 = time.time()
        n_batches = (self._samples + spp_batch - 1) // spp_batch
        for b in range(n_batches):
            kb = jax.random.fold_in(key, b)
            film, rays = step(film, kb, jnp.uint32(b * spp_batch))
            total_rays += int(rays)
            if verbose and (b == 0 or (b + 1) % 8 == 0 or b == n_batches - 1):
                el = time.time() - t0
                print(f"  batch {b + 1}/{n_batches}  "
                      f"{total_rays / max(el, 1e-9) / 1e6:.2f} Mray/s", flush=True)
        img = film_mod.finalize(film, self._filter, 1.0 / self._samples)
        if verbose:
            el = time.time() - t0
            print(f"Rendered {w}x{h}@{self._samples}spp: {total_rays / 1e6:.1f} Mrays "
                  f"in {el:.1f}s = {total_rays / max(el, 1e-9) / 1e6:.2f} Mray/s",
                  flush=True)
        return np.asarray(img)

    def save_png(self, img, path):
        film_mod.save_png(img, path, self._colorspace)
