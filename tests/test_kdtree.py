"""kd-tree build + traversal vs brute force (reference
``src/tracer/object/kdtree/kdtree_tests.rs``: random-ray consistency)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.accel import build as accel_build
from lumo_tpu.accel import kdtree as accel_kd
from lumo_tpu.accel import traverse
from lumo_tpu.scene import shapes
from lumo_tpu.scene.cornell import cornell_box


def _mesh():
    v, f, _ = shapes.blob(subdiv=3, seed=7)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    return (np.asarray(a, np.float32), np.asarray(b, np.float32),
            np.asarray(c, np.float32))


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _brute_t(tri, o, d):
    from lumo_tpu.geometry import intersect as geo
    kz, shear = geo.ray_setup(d)
    a, b, c = (jnp.asarray(x) for x in tri)
    t, _, _ = geo.triangle_t(o, kz, shear, a[None], b[None], c[None],
                             0.0, jnp.inf)
    j = jnp.argmin(t, axis=-1)
    return jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]


@pytest.mark.parametrize("use_native", [None, False])
def test_kd_closest_matches_brute(use_native):
    a, b, c = _mesh()
    lo, hi = accel_build.triangle_bounds(a, b, c)
    kd = accel_kd.build(lo, hi, use_native=use_native)
    assert kd.axis.max() == 3 and (kd.count[kd.axis == 3] >= 0).all()
    kd_dev = {"split": jnp.asarray(kd.split), "axis": jnp.asarray(kd.axis),
              "right": jnp.asarray(kd.right), "first": jnp.asarray(kd.first),
              "count": jnp.asarray(kd.count), "prims": jnp.asarray(kd.prims),
              "lo": jnp.asarray(kd.root_lo), "hi": jnp.asarray(kd.root_hi)}
    o, d = _rays(512)
    t_kd, prim = jax.jit(
        lambda o, d: traverse.kd_closest_hit(kd_dev, (a, b, c), o, d))(o, d)
    t_ref = _brute_t((a, b, c), o, d)
    hit_ref = jnp.isfinite(t_ref)
    assert bool(jnp.all((prim >= 0) == hit_ref))
    np.testing.assert_allclose(np.where(hit_ref, t_kd, 0.0),
                               np.where(hit_ref, t_ref, 0.0),
                               rtol=2e-4, atol=2e-5)


def test_kd_any_hit_matches_closest():
    a, b, c = _mesh()
    lo, hi = accel_build.triangle_bounds(a, b, c)
    kd = accel_kd.build(lo, hi)
    kd_dev = {"split": jnp.asarray(kd.split), "axis": jnp.asarray(kd.axis),
              "right": jnp.asarray(kd.right), "first": jnp.asarray(kd.first),
              "count": jnp.asarray(kd.count), "prims": jnp.asarray(kd.prims),
              "lo": jnp.asarray(kd.root_lo), "hi": jnp.asarray(kd.root_hi)}
    o, d = _rays(256, seed=3)
    t_ref = _brute_t((a, b, c), o, d)
    occ = traverse.kd_any_hit(kd_dev, (a, b, c), o, d,
                              t_max=jnp.full(o.shape[0], 10.0))
    expect = jnp.isfinite(t_ref) & (t_ref < 10.0)
    assert bool(jnp.all(occ == expect))


def test_scene_kdtree_render_matches_bvh():
    """Full scene path: a Cornell box with enough geometry to cross the
    accel threshold renders identically under kd-tree and BVH."""
    from lumo_tpu.scene.scene import BVH_THRESHOLD
    from lumo_tpu.scene import trace

    def make(accel):
        sb = cornell_box()
        v, f, _ = shapes.blob(subdiv=2, seed=1)
        v = v * 80.0 + np.array([278.0, 150.0, 250.0])
        sb.add_triangles(v, f, 0)
        return sb.build(accel=accel)

    s_kd = make("kdtree")
    s_bvh = make("bvh")
    assert s_kd.kdtree is not None and s_kd.n_tris >= BVH_THRESHOLD
    assert s_bvh.bvh is not None

    rng = np.random.default_rng(11)
    o = jnp.asarray(np.tile([[278.0, 273.0, -800.0]], (256, 1)), jnp.float32)
    d = rng.normal(size=(256, 3))
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    t_kd, p_kd = trace._closest(s_kd, o, d, jnp.inf)
    t_bv, p_bv = trace._closest(s_bvh, o, d, jnp.inf)
    np.testing.assert_allclose(np.asarray(t_kd), np.asarray(t_bv),
                               rtol=2e-4, atol=2e-4)
    # prim ids differ (BVH permutes); materials must agree on hits
    hit = np.isfinite(np.asarray(t_kd))
    m_kd = np.asarray(s_kd.tri_mat)[np.asarray(p_kd)]
    m_bv = np.asarray(s_bvh.tri_mat)[np.asarray(p_bv)]
    assert hit.any()
    assert (m_kd[hit] == m_bv[hit]).all()
