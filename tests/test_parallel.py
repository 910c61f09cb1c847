"""Multi-device rendering over the virtual 8-CPU mesh (conftest).

Covers VERDICT r1 item 3: Renderer.render shards over lumo_tpu.parallel
for all three integrators; sharded radiance is bit-exact vs single-device
for path/direct (counter-based per-ray RNG), the psum'd film matches to
float tolerance, and pmean'd gradients equal the single-device gradient.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lumo_tpu import film as film_mod
from lumo_tpu.camera import cornell_camera
from lumo_tpu.color import wavelength
from lumo_tpu.integrators import direct_light, path_trace
from lumo_tpu.parallel import mesh as pmesh
from lumo_tpu.renderer import Renderer
from lumo_tpu.sampling import samplers
from lumo_tpu.scene.cornell import cornell_box

RES = 16


def _scene_camera():
    return cornell_box().build(), cornell_camera(resolution=(RES, RES))


def _rays(camera, n):
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    raster = jnp.stack([px + 0.5, py + 0.5], -1)
    o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))
    lam = wavelength.sample(samplers._randfloat(pix, jnp.uint32(17)))
    ray_key = samplers._hash_u32(pix ^ jnp.uint32(0xA511E9B3))
    return o, d, lam, ray_key


@pytest.mark.parametrize("integrate", [
    lambda s, o, d, lam, rk: path_trace.integrate(s, o, d, lam,
                                                  ray_key=rk)[0],
    lambda s, o, d, lam, rk: direct_light.integrate(s, o, d, lam,
                                                    ray_key=rk)[0],
], ids=["path", "direct"])
def test_sharded_radiance_bit_exact(integrate):
    """Per-ray radiance is bit-identical no matter how rays shard."""
    scene, camera = _scene_camera()
    n = RES * RES
    o, d, lam, ray_key = _rays(camera, n)

    single = jax.jit(lambda: integrate(scene, o, d, lam, ray_key))()

    mesh = pmesh.make_mesh(8)
    sharded_fn = shard_map(
        lambda o_, d_, lam_, rk_: integrate(scene, o_, d_, lam_, rk_),
        mesh=mesh,
        in_specs=(P(pmesh.AXIS), P(pmesh.AXIS), P(pmesh.AXIS),
                  P(pmesh.AXIS)),
        out_specs=P(pmesh.AXIS), check_rep=False)
    sharded = jax.jit(lambda: sharded_fn(o, d, lam, ray_key))()

    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


@pytest.mark.parametrize("integrator", ["path", "direct"])
def test_renderer_sharded_image_matches_single(integrator):
    """Renderer.render over 8 devices == over 1 device (film psum only
    reorders float sums → tight allclose)."""
    scene, camera = _scene_camera()
    img8 = (Renderer(scene, camera).samples(4).integrator(integrator)
            .seed(5).devices(8).render(verbose=False))
    img1 = (Renderer(scene, camera).samples(4).integrator(integrator)
            .seed(5).devices(1).render(verbose=False))
    np.testing.assert_allclose(img8, img1, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_renderer_sharded_bdpt_matches_single():
    """BDPT now draws everything from the per-ray counter streams, so the
    8-device image is the 1-device image exactly (splat psums only
    reorder float additions → tight allclose)."""
    scene, camera = _scene_camera()
    img8 = (Renderer(scene, camera).samples(8).integrator("bdpt")
            .seed(3).devices(8).render(verbose=False))
    img1 = (Renderer(scene, camera).samples(8).integrator("bdpt")
            .seed(3).devices(1).render(verbose=False))
    assert np.all(np.isfinite(img8))
    assert img8.mean() > 0
    np.testing.assert_allclose(img8, img1, rtol=1e-4, atol=1e-5)


def test_sharded_grads_pmean_correct():
    """pmean'd per-shard gradients == single-device gradient of the mean
    loss (the multi-chip training step contract)."""
    scene, camera = _scene_camera()
    n = RES * RES
    o, d, lam, ray_key = _rays(camera, n)
    is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
                for k, v in scene.materials.items()}
    mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}

    def loss_fn(mats, o_, d_, lam_, rk_):
        materials = {k: (mats[k] if is_float[k] else scene.materials[k])
                     for k in scene.materials}
        scene2 = dataclasses.replace(scene, materials=materials)
        r = path_trace.integrate(scene2, o_, d_, lam_, ray_key=rk_,
                                 fixed_depth=2)[0]
        return jnp.mean(r ** 2)

    g1 = jax.jit(jax.grad(lambda m: loss_fn(m, o, d, lam, ray_key)))(mat_float)

    mesh = pmesh.make_mesh(8)

    def shard_fn(mats, o_, d_, lam_, rk_):
        g = jax.grad(loss_fn)(mats, o_, d_, lam_, rk_)
        return jax.tree.map(lambda x: jax.lax.pmean(x, pmesh.AXIS), g)

    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P(), P(pmesh.AXIS), P(pmesh.AXIS),
                                  P(pmesh.AXIS), P(pmesh.AXIS)),
                        out_specs=P(), check_rep=False)
    g8 = jax.jit(lambda m: sharded(m, o, d, lam, ray_key))(mat_float)

    for k in g1:
        np.testing.assert_allclose(np.asarray(g8[k]), np.asarray(g1[k]),
                                    rtol=2e-4, atol=1e-6, err_msg=k)
