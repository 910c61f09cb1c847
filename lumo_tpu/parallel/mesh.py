"""Device-mesh parallel rendering: rays sharded, scene replicated,
film psum-reduced over ICI.

TPU-native replacement of the reference's thread pool + mpsc channels
(``src/pool*``, SURVEY §2.9): the (pixel × sample) wavefront is the
data-parallel axis, sharded over a 1-D ``Mesh`` with ``shard_map``; the
scene/BVH buffers are replicated (≡ the reference's ``Arc<Scene>``); film
and parameter gradients are reduced with ``psum`` collectives.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from lumo_tpu import film as film_mod
from lumo_tpu.color import wavelength
from lumo_tpu.integrators import path_trace
from lumo_tpu.sampling import samplers

AXIS = "rays"


def make_mesh(n_devices=None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def render_step_sharded(mesh: Mesh, scene, camera, spp_batch, total_spp,
                        seed=0, filt=None, wbm=None, fixed_depth=None,
                        tone_kind=film_mod.NOMAP):
    """Build a pjit'd sharded render step.

    Returns step(film, key, sample_base) -> (film, rays) where the
    (H·W·spp_batch) wavefront is sharded over the mesh and each shard's
    partial film is psum-reduced.  The pixel count must divide the mesh
    size (padded by caller if needed).
    """
    if filt is None:
        filt = film_mod.PixelFilter.gaussian()
    if wbm is None:
        wbm = jnp.asarray(film_mod.wb_matrix("DCI-P3", "D65"), jnp.float32)
    w, h = camera.resolution
    n_pix = w * h
    n_dev = mesh.devices.size
    assert (n_pix * spp_batch) % n_dev == 0, "wavefront must divide mesh"

    def shard_work(scene_, camera_, ray_ids, key, sample_base):
        # ray_ids: local shard of the global (spp·n_pix) index space
        pix = (ray_ids % n_pix).astype(jnp.uint32)
        sidx = (ray_ids // n_pix).astype(jnp.uint32) + sample_base
        px = (pix % w).astype(jnp.float32)
        py = (pix // w).astype(jnp.float32)
        offs = samplers.pixel_offsets(samplers.MULTI_JITTERED, sidx, total_spp,
                                      pix, seed)
        raster = jnp.stack([px + offs[..., 0], py + offs[..., 1]], axis=-1)
        u_lam = samplers._randfloat(pix, jnp.uint32(seed * 7919 + 13)
                                    ^ (sidx * jnp.uint32(0x9E3779B9)))
        lam = wavelength.sample(u_lam)
        me = jax.lax.axis_index(AXIS)
        k = jax.random.fold_in(key, me)
        k_dof, k_int = jax.random.split(k)
        u_dof = jax.random.uniform(k_dof, raster.shape)
        o, d = camera_.generate_ray(raster, u_dof)
        radiance, lam_out, depth = path_trace.integrate(
            scene_, o, d, lam, k_int, fixed_depth=fixed_depth)
        color = film_mod.tone_map(tone_kind, radiance, lam_out)
        rgb = film_mod.spectral_to_rgb(color, lam_out, wbm)
        film_p = film_mod.new_film((w, h))
        film_p = film_mod.add_samples(film_p, filt, raster, rgb, (w, h))
        film_p = jax.tree.map(lambda x: jax.lax.psum(x, AXIS), film_p)
        rays = jax.lax.psum(jnp.sum(depth) + raster.shape[0], AXIS)
        return film_p, rays

    sharded = shard_map(
        shard_work, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(), P()),
        out_specs=(P(), P()),
        check_rep=False)

    @jax.jit
    def step(film, key, sample_base):
        ray_ids = jnp.arange(n_pix * spp_batch, dtype=jnp.int32)
        film_p, rays = sharded(scene, camera, ray_ids, key, sample_base)
        film = jax.tree.map(jnp.add, film, film_p)
        return film, rays

    return step
