"""BVH build + traversal vs brute-force ground truth.

Mirrors the reference's accel tests (``kdtree/kdtree_tests.rs``: 10k random
rays against meshes must agree with linear scan).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.scene import shapes
from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder
from lumo_tpu.scene import trace


@pytest.fixture(scope="module")
def blob_scene():
    b = SceneBuilder()
    v, f, vn = shapes.blob(subdiv=3, seed=7)   # 1280 tris
    b.add_triangles(v, f, Material.lambertian((0.7, 0.7, 0.7)),
                    normals=vn, vertex_normal_idx=f)
    b.add_sphere((0.0, 2.5, 0.0), 0.5, Material.light((1.0, 1.0, 1.0)))
    return b.build()


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_bvh_built(blob_scene):
    assert blob_scene.bvh is not None
    count = np.asarray(blob_scene.bvh["count"])
    first = np.asarray(blob_scene.bvh["first"])
    # every leaf <= 4 prims; leaves cover all prims exactly once
    leaves = count > 0
    assert count[leaves].max() <= 4
    covered = np.zeros(blob_scene.n_tris, bool)
    for f, c in zip(first[leaves], count[leaves]):
        assert not covered[f:f + c].any()
        covered[f:f + c] = True
    assert covered.all()


def test_bvh_matches_bruteforce(blob_scene):
    scene = blob_scene
    brute = dataclasses.replace(scene, bvh=None)
    o, d = _random_rays(4096)
    t_b, p_b = jax.jit(trace._closest, static_argnums=())(brute, o, d, jnp.inf)
    t_v, p_v = trace._closest(scene, o, d, jnp.inf)
    t_b, p_b, t_v, p_v = map(np.asarray, (t_b, p_b, t_v, p_v))
    hit_b = np.isfinite(t_b)
    hit_v = np.isfinite(t_v)
    assert (hit_b == hit_v).all()
    np.testing.assert_allclose(t_v[hit_v], t_b[hit_b], rtol=1e-5, atol=1e-6)
    # same primitive (or same t in case of shared-edge tie)
    same = p_v == p_b
    np.testing.assert_allclose(t_v[hit_v & ~same], t_b[hit_b & ~same],
                               rtol=1e-5)


def test_bvh_anyhit_matches(blob_scene):
    scene = blob_scene
    brute = dataclasses.replace(scene, bvh=None)
    o, d = _random_rays(4096, seed=3)
    t_max = jnp.full((4096,), 2.0)
    occ_b = np.asarray(trace.occluded(brute, o, d, t_max))
    occ_v = np.asarray(trace.occluded(scene, o, d, t_max))
    assert (occ_b == occ_v).all()


def test_bvh_render_smoke(blob_scene):
    """A few path-traced wavefront bounces through the BVH produce finite
    radiance."""
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import path_trace
    n = 256
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 3.0]], jnp.float32), (n, 1))
    ang = jnp.linspace(0, 2 * jnp.pi, n)
    d = jnp.stack([0.3 * jnp.cos(ang), 0.3 * jnp.sin(ang), -jnp.ones(n)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    lam = wavelength.sample(jnp.linspace(0.01, 0.99, n))
    rad, lam_out, depth = path_trace.integrate(
        blob_scene, o, d, lam, jax.random.PRNGKey(0), fixed_depth=3)
    assert bool(jnp.isfinite(rad).all())
    assert bool((rad >= 0).all())
