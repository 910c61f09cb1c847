"""Runtime instancing: shared geometry + per-instance inverse-transformed
rays + material override (reference ``src/tracer/object/instance.rs``:
ray transform without dir renormalization :81-105, material override
:5-15; the plain-vs-instanced equivalence mirrors the ``test_object!``
instantiation at ``instance.rs:301-344``)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.scene import shapes, trace
from lumo_tpu.scene.instance import Mesh, rotate_y, scale, translation
from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder


def _blob_mesh():
    v, f, vn = shapes.blob(subdiv=3, seed=2, amp=0.2)
    return Mesh(v, f, normals=vn)


TRANSFORMS = [
    translation(1.5, 0.0, 0.0) @ rotate_y(0.8),
    translation(-1.2, 0.4, -0.6) @ scale(0.7, 1.3, 0.9),
]


def _instanced_scene():
    sb = SceneBuilder()
    mats = [Material.diffuse((0.8, 0.2, 0.2)),
            Material.metal((0.9, 0.8, 0.3), 0.2, 2.5, 3.0)]
    _blob_mesh().add_instances_to(sb, TRANSFORMS, mats)
    sb.add_sphere((0.0, 50.0, 0.0), 1.0, Material.light((1, 1, 1)))
    return sb.build()


def _baked_scene():
    sb = SceneBuilder()
    mats = [Material.diffuse((0.8, 0.2, 0.2)),
            Material.metal((0.9, 0.8, 0.3), 0.2, 2.5, 3.0)]
    for m, mat in zip(TRANSFORMS, mats):
        mesh = _blob_mesh()
        mesh.apply(m)
        mesh.add_to(sb, mat)
    sb.add_sphere((0.0, 50.0, 0.0), 1.0, Material.light((1, 1, 1)))
    return sb.build(accel="none")


def _rays(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    target = np.array([[1.5, 0, 0], [-1.2, 0.4, -0.6]])[rng.integers(0, 2, n)]
    d = target + rng.normal(size=(n, 3)) * 0.6 - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def test_geometry_not_duplicated():
    scene = _instanced_scene()
    assert len(scene.inst) == 1
    grp = scene.inst[0]
    Tg = grp["a"].shape[0]
    assert grp["minv"].shape[0] == 2
    assert scene.n_tris == 0            # shared copy only, not baked
    assert scene.n_inst_prims == 2 * Tg


def test_instanced_matches_baked():
    """Same hits (t, instance, material) as the baked duplicate scene."""
    si = _instanced_scene()
    sb = _baked_scene()
    o, d = _rays()
    rng = jnp.arange(o.shape[0], dtype=jnp.uint32)
    hi = trace.intersect(si, o, d, rng=rng)
    hb = trace.intersect(sb, o, d, rng=rng)
    vi = np.asarray(hi["valid"])
    vb = np.asarray(hb["valid"])
    assert (vi == vb).mean() > 0.999
    sel = vi & vb
    assert sel.sum() > 1000
    np.testing.assert_allclose(np.asarray(hi["t"])[sel],
                               np.asarray(hb["t"])[sel],
                               rtol=5e-4, atol=5e-4)
    # material override maps per instance
    assert (np.asarray(hi["mat"])[sel] == np.asarray(hb["mat"])[sel]).mean() \
        > 0.999
    # hit points and normals agree
    np.testing.assert_allclose(np.asarray(hi["p"])[sel],
                               np.asarray(hb["p"])[sel],
                               rtol=1e-3, atol=2e-3)
    dots = np.sum(np.asarray(hi["ng"])[sel] * np.asarray(hb["ng"])[sel], -1)
    assert np.quantile(dots, 0.001) > 0.99


def test_instanced_occlusion():
    """Instanced geometry blocks shadow rays."""
    si = _instanced_scene()
    n = 512
    rng = np.random.default_rng(5)
    # rays through the first instance (centered at (1.5, 0, 0))
    o = np.tile(np.array([1.5, 0.0, -5.0], np.float32), (n, 1))
    o[:, :2] += rng.normal(size=(n, 2)).astype(np.float32) * 0.2
    d = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    occ = trace.occluded(si, jnp.asarray(o), jnp.asarray(d),
                         jnp.full((n,), 10.0, jnp.float32))
    assert np.asarray(occ).mean() > 0.6
    # and rays that miss everything are unoccluded
    o2 = o + np.array([50.0, 0.0, 0.0], np.float32)
    occ2 = trace.occluded(si, jnp.asarray(o2), jnp.asarray(d),
                          jnp.full((n,), 10.0, jnp.float32))
    assert not np.asarray(occ2).any()


@pytest.mark.slow
def test_instanced_grads_flow():
    """Material gradients flow through a render of an instanced scene."""
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import path_trace

    scene = _instanced_scene()
    n = 256
    rng = np.random.default_rng(7)
    o = np.tile(np.array([1.5, 0.0, -4.0], np.float32), (n, 1))
    d = (np.array([1.5, 0.0, 0.0]) + rng.normal(size=(n, 3)) * 0.4
         - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lam = wavelength.sample(jnp.linspace(0.05, 0.95, n))
    rk = jnp.arange(n, dtype=jnp.uint32)
    is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
                for k, v in scene.materials.items()}
    mats = {k: v for k, v in scene.materials.items() if is_float[k]}

    def loss(m):
        mm = {k: (m[k] if is_float[k] else scene.materials[k])
              for k in scene.materials}
        sc = dataclasses.replace(scene, materials=mm)
        r, _, _ = path_trace.integrate(sc, jnp.asarray(o), jnp.asarray(d),
                                       lam, ray_key=rk, fixed_depth=2)
        return jnp.mean(r)

    g = jax.jit(jax.grad(loss))(mats)
    gn = sum(float(jnp.sum(jnp.abs(v))) for v in g.values())
    assert np.isfinite(gn) and gn > 0.0


def test_light_instances_bake():
    """LIGHT-material instances are accepted (round 4): realized as baked
    world-space light triangles, so they appear in the light tables
    instead of the runtime-shared instance groups."""
    sb = SceneBuilder()
    _blob_mesh().add_instances_to(sb, [np.eye(4)],
                                  [Material.light((1, 1, 1))])
    s = sb.build()
    assert s.n_lights > 0
    assert not s.inst


# ---------------------------------------------------------------------------
# instanced lights (reference ``instance.rs:169-199``, ``:301-344``)

def test_instanced_light_matches_baked():
    """An instanced LIGHT mesh must be Sampleable with pdfs/areas equal
    to the analytically transformed plain light (reference asserts
    instance pdf/area == transformed-object pdf/area)."""
    quad_v = np.asarray([[-0.5, 0.0, -0.5], [0.5, 0.0, -0.5],
                         [0.5, 0.0, 0.5], [-0.5, 0.0, 0.5]])
    quad_f = np.asarray([[0, 1, 2], [0, 2, 3]])
    T = translation(0.2, 1.9, -1.1) @ rotate_y(0.6) @ scale(1.7, 1.0, 0.8)
    light = Material.light((1.0, 0.9, 0.8), scale=5.0)
    floor = Material.diffuse((0.7, 0.7, 0.7))

    def base(sb):
        sb.add_rectangle((-3, -1, -4), (3, -1, -4), (-3, -1, 2), floor)

    sb_i = SceneBuilder()
    base(sb_i)
    sb_i.add_instanced_triangles(quad_v, quad_f, [T], [light])
    s_inst = sb_i.build()

    sb_b = SceneBuilder()
    base(sb_b)
    vw = quad_v @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    sb_b.add_triangles(vw, quad_f, light)
    s_bake = sb_b.build()

    # identical light tables: area-proportional pdfs and prim geometry
    assert s_inst.n_lights == s_bake.n_lights == 2
    np.testing.assert_allclose(np.asarray(s_inst.light_pdf),
                               np.asarray(s_bake.light_pdf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_inst.tri_a),
                               np.asarray(s_bake.tri_a), rtol=1e-6)

    # sample_towards / pdf parity from a fixed shading point
    xo = jnp.asarray([[0.0, -0.5, -1.0]] * 64, jnp.float32)
    u = jax.random.uniform(jax.random.PRNGKey(0), (64, 2))
    li = jnp.zeros((64,), jnp.int32)
    wi_i = trace.sample_towards(s_inst, li, xo, u)
    wi_b = trace.sample_towards(s_bake, li, xo, u)
    np.testing.assert_allclose(np.asarray(wi_i), np.asarray(wi_b),
                               atol=1e-6)
    # pdf at the sampled directions (hit point/ng via light_hit)
    lh_i = trace.light_hit(s_inst, li, xo, wi_i)
    p_i = trace.sample_towards_pdf(s_inst, li, xo, wi_i, lh_i["p"],
                                   lh_i["ng"])
    lh_b = trace.light_hit(s_bake, li, xo, wi_b)
    p_b = trace.sample_towards_pdf(s_bake, li, xo, wi_b, lh_b["p"],
                                   lh_b["ng"])
    np.testing.assert_allclose(np.asarray(p_i), np.asarray(p_b),
                               rtol=1e-5)


def test_instanced_light_renders():
    """End-to-end: a scene lit ONLY by an instanced light renders
    non-black and matches the baked-light render."""
    from lumo_tpu.camera import build_camera
    from lumo_tpu.renderer import Renderer

    quad_v = np.asarray([[-0.5, 0.0, -0.5], [0.5, 0.0, -0.5],
                         [0.5, 0.0, 0.5], [-0.5, 0.0, 0.5]])
    quad_f = np.asarray([[0, 1, 2], [0, 2, 3]])
    T = translation(0.0, 0.75, -1.5) @ scale(0.8, 1.0, 0.8)
    light = Material.light((1.0, 1.0, 1.0), scale=8.0)
    floor = Material.diffuse((0.7, 0.7, 0.7))
    cam = build_camera(resolution=(16, 16))

    sb_i = SceneBuilder()
    sb_i.add_rectangle((-3, -0.79, -4), (3, -0.79, -4), (-3, -0.79, 2),
                       floor)
    sb_i.add_instanced_triangles(quad_v, quad_f, [T], [light])
    img_i = Renderer(sb_i.build(), cam).samples(16).seed(3) \
        .render(verbose=False)

    sb_b = SceneBuilder()
    sb_b.add_rectangle((-3, -0.79, -4), (3, -0.79, -4), (-3, -0.79, 2),
                       floor)
    vw = quad_v @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    sb_b.add_triangles(vw, quad_f, light)
    img_b = Renderer(sb_b.build(), cam).samples(16).seed(3) \
        .render(verbose=False)

    assert img_i.mean() > 1e-3
    np.testing.assert_allclose(img_i, img_b, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_many_instances_flattened_path():
    """Groups with > 4 instances take the flattened single-traversal
    path; the image must match the per-instance loop result (here: the
    baked-geometry render)."""
    from lumo_tpu.camera import build_camera
    from lumo_tpu.renderer import Renderer

    n_inst = 6
    rng = np.random.default_rng(4)
    ts, ms = [], []
    for i in range(n_inst):
        ts.append(translation(-1.2 + 0.45 * i, -0.3 + 0.1 * (i % 3), -1.6)
                  @ rotate_y(0.5 * i) @ scale(0.35, 0.45, 0.35))
        ms.append(Material.diffuse(tuple(rng.uniform(0.2, 0.9, 3))))
    v, f, vn = shapes.blob(subdiv=2, seed=3, amp=0.15)

    sb_i = SceneBuilder()
    sb_i.add_sphere((0.0, 40.0, -1.0), 3.0, Material.light((1, 1, 1),
                                                           scale=60.0))
    Mesh(v, f, normals=vn).add_instances_to(sb_i, ts, ms)
    s_inst = sb_i.build()
    assert s_inst.inst and s_inst.inst[0]["minv"].shape[0] == n_inst

    sb_b = SceneBuilder()
    sb_b.add_sphere((0.0, 40.0, -1.0), 3.0, Material.light((1, 1, 1),
                                                           scale=60.0))
    for t, m in zip(ts, ms):
        sb_b.add_triangles(v, f, m, normals=vn, vertex_normal_idx=f,
                           transform=t)
    s_bake = sb_b.build()

    cam = build_camera(resolution=(16, 16))
    img_i = Renderer(s_inst, cam).samples(4).seed(2).render(verbose=False)
    img_b = Renderer(s_bake, cam).samples(4).seed(2).render(verbose=False)
    assert np.isfinite(img_i).all()
    np.testing.assert_allclose(img_i, img_b, rtol=2e-2, atol=2e-3)
