"""Pallas packet-traversal kernel vs brute force (interpret mode on CPU).

The kernel itself targets TPU; interpret mode checks the exact same
traversal logic lane-for-lane.  On-chip coverage comes from
``tools/tpu_smoke.py`` (the driver bench runs it every round).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumo_tpu.accel import build as accel_build
from lumo_tpu.accel import pallas_bvh
from lumo_tpu.config import INF
from lumo_tpu.geometry import intersect as geo


def _random_soup(T, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    b = a + rng.uniform(-0.25, 0.25, (T, 3)).astype(np.float32)
    c = a + rng.uniform(-0.25, 0.25, (T, 3)).astype(np.float32)
    return a, b, c


def _packed(T, seed=0, lblk=128):
    a, b, c = _random_soup(T, seed)
    lo, hi = accel_build.triangle_bounds(a, b, c)
    bvh = accel_build.build(lo, hi, use_native=False)
    p = bvh.order
    ap, bp, cp = a[p], b[p], c[p]
    blk = pallas_bvh.pack_blocks(
        {"lo": bvh.node_lo, "hi": bvh.node_hi, "right": bvh.node_right,
         "first": bvh.node_first, "count": bvh.node_count,
         "axis": bvh.node_axis}, ap, bp, cp, lblk=lblk)
    return pallas_bvh.to_device(blk), ap, bp, cp


def _rays(N, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _brute(ap, bp, cp, o, d, t_max=INF):
    kz, shear = geo.ray_setup(d)
    t_all, _, _ = geo.triangle_t(o, kz, shear, jnp.asarray(ap)[None],
                                 jnp.asarray(bp)[None],
                                 jnp.asarray(cp)[None], 0.0, t_max)
    return (jnp.min(t_all, axis=-1),
            jnp.argmin(t_all, axis=-1).astype(jnp.int32))


@pytest.mark.parametrize("T,sub,lblk", [(500, 1, 128), (3000, 2, 128),
                                        (3000, 1, 512), (3000, 1, 1024)])
def test_closest_matches_brute_force(T, sub, lblk):
    blk, ap, bp, cp = _packed(T, lblk=lblk)
    o, d = _rays(257)
    t_k, p_k = pallas_bvh.closest_hit(blk, o, d, interpret=True, sub=sub)
    t_r, p_r = _brute(ap, bp, cp, o, d)
    miss = ~np.isfinite(np.asarray(t_r))
    assert np.array_equal(np.asarray(p_k) < 0, miss)
    np.testing.assert_allclose(np.where(miss, 0, np.asarray(t_k)),
                               np.where(miss, 0, np.asarray(t_r)),
                               rtol=1e-5, atol=1e-6)
    assert np.all((np.asarray(p_k) == np.asarray(p_r)) | miss)


def test_any_hit_matches():
    blk, ap, bp, cp = _packed(800, seed=3)
    o, d = _rays(200, seed=4)
    tm = jnp.full((200,), 1.5)
    occ = pallas_bvh.any_hit(blk, o, d, t_max=tm, interpret=True, sub=1)
    t_r, _ = _brute(ap, bp, cp, o, d)
    ref = np.isfinite(np.asarray(t_r)) & (np.asarray(t_r) < 1.5)
    assert np.array_equal(np.asarray(occ), ref)


def test_oversized_scene_grows_blocks():
    """Node cap: pack_blocks doubles lblk instead of exceeding SMEM."""
    blk, *_ = _packed(600, lblk=32)
    assert blk["lblk"] >= 32
    assert blk["tri_blk"].shape[-1] == blk["lblk"]


@pytest.mark.slow
def test_grad_through_accelerated_scene():
    """Reverse mode works through a BVH scene: traversal is stop-gradded,
    hit t re-derived differentiably (trace._closest)."""
    import dataclasses

    from lumo_tpu.scene.cornell import empty_box
    from lumo_tpu.scene.instance import Mesh
    from lumo_tpu.scene.materials import Material
    from lumo_tpu.scene import shapes
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import path_trace

    sb = empty_box((0.9, 0.9, 0.9), Material.diffuse((0.8, 0.2, 0.2)),
                   Material.diffuse((0.2, 0.8, 0.2)))
    v, f, vn = shapes.blob(subdiv=3, seed=5, amp=0.2)
    mesh = Mesh(v, f, normals=vn)
    (mesh.to_unit_size().to_origin().set_y(-0.75).translate(0.0, 0.0, -1.5)
     .add_to(sb, Material.diffuse((0.6, 0.6, 0.2))))
    scene = sb.build()
    assert scene.bvh is not None

    N = 64
    rng = np.random.default_rng(0)
    o = np.tile(np.array([0.0, 0.0, 0.1], np.float32), (N, 1))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lam = wavelength.sample(jnp.linspace(0.05, 0.95, N))

    is_float = {k: jnp.issubdtype(val.dtype, jnp.floating)
                for k, val in scene.materials.items()}
    mats = {k: val for k, val in scene.materials.items() if is_float[k]}

    def loss(m):
        materials = {k: (m[k] if is_float[k] else scene.materials[k])
                     for k in scene.materials}
        sc = dataclasses.replace(scene, materials=materials)
        r, _, _ = path_trace.integrate(sc, jnp.asarray(o), jnp.asarray(d),
                                       lam, jax.random.PRNGKey(0),
                                       fixed_depth=2)
        return jnp.mean(r)

    val, g = jax.value_and_grad(loss)(mats)
    assert np.isfinite(float(val))
    gn = sum(float(jnp.sum(jnp.abs(v))) for v in g.values())
    assert np.isfinite(gn) and gn > 0.0
