"""Property tests for the analytic primitives (plane/disk/cone/cylinder)
— the wavefront analog of the reference's ``test_util::test_object!`` /
``test_sampleable!`` macros (``object/test_util.rs:1-87``), instantiated
for the shapes in ``{plane,disk,cone,cylinder}.rs``."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.geometry import analytic
from lumo_tpu.geometry import intersect as geo
from lumo_tpu.scene import trace
from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder


def _scene_with(add):
    sb = SceneBuilder()
    add(sb)
    # a light somewhere far so build() is a valid render scene
    sb.add_sphere((0.0, 50.0, 0.0), 1.0, Material.light((1.0, 1.0, 1.0)))
    return sb.build()


SHAPES = {
    "plane": lambda sb: sb.add_plane((0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                                     Material.diffuse((0.5, 0.5, 0.5))),
    "disk": lambda sb: sb.add_disk((0.0, 0.0, 0.0), (0.3, 1.0, 0.1), 1.5,
                                   Material.diffuse((0.5, 0.5, 0.5))),
    "cone": lambda sb: sb.add_cone(1.2, 0.8,
                                   Material.diffuse((0.5, 0.5, 0.5))),
    "cylinder": lambda sb: sb.add_cylinder(1.2, 0.8,
                                           Material.diffuse((0.5, 0.5, 0.5))),
}

# aim targets well inside each shape's surface region
TARGETS = {
    "plane": np.array([0.2, 0.0, -0.3]),
    "disk": np.array([0.0, 0.0, 0.0]),
    "cone": np.array([0.0, 0.4, 0.0]),
    "cylinder": np.array([0.0, 0.6, 0.0]),
}


def _rays_at(target, n=256, r=5.0, seed=0, flat=False):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    if flat:
        # open shapes (no caps): approach near-horizontally so the
        # lateral surface is always crossed inside the height range
        d[:, 1] *= 0.1
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = target[None] + d * r
    jit = rng.normal(size=(n, 3)) * 0.02
    dirs = target[None] + jit - o
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(dirs, jnp.float32)


def _surface_err(name, p):
    """|implicit function| at p, local/world identical for these fixtures
    (identity frames except the tilted disk, handled via its normal)."""
    p = np.asarray(p)
    if name == "plane":
        return np.abs(p[:, 1])
    if name == "disk":
        n = np.array([0.3, 1.0, 0.1])
        n /= np.linalg.norm(n)
        return np.abs(p @ n)
    if name == "cone":
        h, r = 1.2, 0.8
        rad = np.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2)
        return np.abs(rad - (h - p[:, 1]) * (r / h)) / np.sqrt(2.0)
    if name == "cylinder":
        rad = np.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2)
        return np.abs(rad - 0.8)
    raise KeyError(name)


@pytest.mark.parametrize("name", list(SHAPES))
def test_object_properties(name):
    scene = _scene_with(SHAPES[name])
    o, d = _rays_at(TARGETS[name], flat=name in ("cone", "cylinder"))
    hit = trace.intersect(scene, o, d)
    hit = {k: np.asarray(v) for k, v in hit.items()}
    frac = hit["valid"].mean()
    assert frac > 0.9, f"{name}: only {frac:.2f} of aimed rays hit"
    v = hit["valid"]
    # hit point lies on the surface
    assert _surface_err(name, hit["p"][v]).max() < 1e-3
    # geometric normal is unit length
    nrm = np.linalg.norm(hit["ng"][v], axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-4)
    # t consistent with |p - o|
    dist = np.linalg.norm(hit["p"][v] - np.asarray(o)[v], axis=-1)
    np.testing.assert_allclose(hit["t"][v], dist, rtol=1e-3, atol=1e-3)
    # no hit behind: all t positive
    assert (hit["t"][v] > 0.0).all()


@pytest.mark.parametrize("name", list(SHAPES))
def test_no_self_intersect(name):
    """Reference ``test_object!`` reflect-off-surface test: a ray leaving
    the hit point (robust offset) away from the surface never re-hits at
    ~zero t (``test_util.rs:12-24``)."""
    scene = _scene_with(SHAPES[name])
    o, d = _rays_at(TARGETS[name], seed=3, flat=name in ("cone", "cylinder"))
    hit = trace.intersect(scene, o, d)
    wi = jnp.asarray(np.asarray(hit["ng"]))  # leave along the normal
    # flip to the side the ray came from
    side = jnp.sign(-jnp.sum(jnp.asarray(d) * wi, axis=-1, keepdims=True))
    wi = wi * jnp.where(side == 0.0, 1.0, side)
    ro = geo.offset_ray_origin(hit["p"], hit["err"], hit["ng"], wi)
    hit2 = trace.intersect(scene, ro, wi)
    v = np.asarray(hit["valid"])
    t2 = np.asarray(hit2["t"])[v]
    assert (t2 > 1e-4).all(), f"{name}: min re-hit t {t2.min():.2e}"


@pytest.mark.parametrize("name", list(SHAPES))
def test_occluded_matches_intersect(name):
    scene = _scene_with(SHAPES[name])
    o, d = _rays_at(TARGETS[name], seed=5, flat=name in ("cone", "cylinder"))
    hit = trace.intersect(scene, o, d)
    t = np.asarray(hit["t"])
    occ_long = np.asarray(trace.occluded(
        scene, o, d, jnp.full(o.shape[0], 1e4)))
    v = np.asarray(hit["valid"])
    # every closest hit inside the range is seen by the any-hit query
    assert occ_long[v].all()


def test_plane_parallel_ray_misses():
    scene = _scene_with(SHAPES["plane"])
    o = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    hit = trace.intersect(scene, o, d)
    # travels parallel above the plane: may only hit the far light sphere
    assert float(hit["t"][0]) > 10.0 or not bool(hit["valid"][0])


def test_cylinder_inside_hit():
    """Rays from inside the cylinder hit the far wall, not t=0."""
    scene = _scene_with(SHAPES["cylinder"])
    o = jnp.asarray([[0.0, 0.6, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    hit = trace.intersect(scene, o, d)
    assert bool(hit["valid"][0])
    np.testing.assert_allclose(float(hit["t"][0]), 0.8, rtol=1e-4)


def test_cone_transformed():
    """Rigid+uniform-scale transform: hit the transformed cone where the
    analytically transformed surface is (Instance semantics,
    ``instance.rs:81-105``)."""
    th = 0.7
    c, s = np.cos(th), np.sin(th)
    rot_z = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    m = np.eye(4)
    m[:3, :3] = rot_z * 2.0   # uniform scale 2
    m[:3, 3] = [3.0, 1.0, -2.0]
    sb = SceneBuilder()
    sb.add_cone(1.0, 0.5, Material.diffuse((0.5, 0.5, 0.5)), transform=m)
    sb.add_sphere((0.0, 50.0, 0.0), 1.0, Material.light((1.0, 1.0, 1.0)))
    scene = sb.build()
    # local point on the surface: y=0.5 ring, radius 0.25
    pl = np.array([0.25, 0.5, 0.0])
    pw = rot_z @ (pl * 2.0) + np.array([3.0, 1.0, -2.0])
    o = jnp.asarray([pw + np.array([5.0, 2.0, 3.0])], jnp.float32)
    d = jnp.asarray([-np.array([5.0, 2.0, 3.0])
                     / np.linalg.norm([5.0, 2.0, 3.0])], jnp.float32)
    hit = trace.intersect(scene, o, d)
    assert bool(hit["valid"][0])
    p = np.asarray(hit["p"][0])
    # back to local: |rad - (h - y) r/h| small
    loc = (rot_z.T @ (p - np.array([3.0, 1.0, -2.0]))) / 2.0
    rad = np.hypot(loc[0], loc[2])
    assert abs(rad - (1.0 - loc[1]) * 0.5) < 1e-3


def test_disk_light_sampleable():
    """test_sampleable!: NEE rays sampled towards a disk light hit it
    with pdf > 0 (``test_util.rs:49-87``); and a direct-light render lit
    only by a disk light is non-zero."""
    sb = SceneBuilder()
    sb.add_rectangle((-2, -1, -2), (2, -1, -2), (2, -1, 2),
                     Material.diffuse((0.7, 0.7, 0.7)))
    lid = sb.add_disk((0.0, 2.0, 0.0), (0.0, -1.0, 0.0), 0.7,
                      Material.light((1.0, 0.9, 0.8), scale=5.0))
    scene = sb.build()
    assert scene.n_ana_lights == 1

    n = 128
    rng = np.random.default_rng(0)
    xo = np.concatenate([rng.uniform(-1.5, 1.5, (n, 1)),
                         np.full((n, 1), -1.0),
                         rng.uniform(-1.5, 1.5, (n, 1))], axis=1)
    xo = jnp.asarray(xo, jnp.float32)
    u = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    light = jnp.zeros(n, jnp.int32)
    wi = trace.sample_towards(scene, light, xo, u)
    lh = trace.light_hit(scene, light, xo, wi)
    assert np.asarray(lh["valid"]).all()
    pdf = trace.sample_towards_pdf(scene, light, xo, wi, lh["p"], lh["ng"])
    assert (np.asarray(pdf) > 0.0).all()
    # hit points lie on the disk: y == 2, radius <= 0.7
    p = np.asarray(lh["p"])
    np.testing.assert_allclose(p[:, 1], 2.0, atol=1e-4)
    assert (np.hypot(p[:, 0], p[:, 2]) <= 0.7 + 1e-4).all()

    # area of the disk light
    area = float(trace.light_area(scene, light)[0])
    np.testing.assert_allclose(area, np.pi * 0.49, rtol=1e-5)

    # end-to-end: direct light render is finite and non-zero
    from lumo_tpu.camera import build_camera
    from lumo_tpu.renderer import DIRECT_LIGHT, Renderer
    cam = build_camera(origin=(0.0, 0.5, 4.0), towards=(0.0, 0.0, 0.0),
                       resolution=(16, 16))
    img = Renderer(scene, cam).integrator(DIRECT_LIGHT).samples(8) \
        .render(verbose=False)
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4


def test_analytic_t_gradients():
    """Hit distances differentiate w.r.t. primitive params (translation)."""
    kind = jnp.asarray([analytic.CYLINDER], jnp.int32)
    rot = jnp.eye(3)[None]
    radius = jnp.asarray([0.5])
    height = jnp.asarray([2.0])
    o = jnp.asarray([[3.0, 1.0, 0.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])

    def t_of(tx):
        trans = jnp.stack([tx, jnp.zeros(()), jnp.zeros(())])[None]
        return analytic.analytic_t(o, d, kind, rot, trans, radius, height,
                                   0.0, jnp.inf)[0, 0]

    # hit at x = tx + r from origin x=3 moving in -x: t = 3 - tx - r,
    # so dt/dtx = -1
    g = jax.grad(t_of)(jnp.asarray(0.0))
    np.testing.assert_allclose(float(g), -1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# ellipsoid: reference Instance<Sphere> with non-uniform scale
# (instance.rs:81-105, :169-199)

def _ellipsoid_transform():
    from lumo_tpu.scene.instance import rotate_y, scale, translation
    return translation(0.3, -0.2, 0.1) @ rotate_y(0.7) @ scale(1.5, 0.6, 1.0)


def _ellipsoid_scene():
    m = _ellipsoid_transform()
    return _scene_with(lambda sb: sb.add_sphere(
        (0.1, 0.0, -0.1), 0.8, Material.diffuse((0.5, 0.5, 0.5)),
        transform=m)), m


def _ray_ellipsoid_f64(L, trans, o, d):
    """f64 reference: smallest positive root of |L(o + t d - trans)|²=1."""
    ol = (o - trans) @ L.T
    dl = d @ L.T
    a = np.sum(dl * dl, -1)
    b = 2 * np.sum(ol * dl, -1)
    c = np.sum(ol * ol, -1) - 1.0
    disc = b * b - 4 * a * c
    t = np.full(len(o), np.inf)
    ok = disc >= 0
    sq = np.sqrt(np.maximum(disc, 0))
    lo = (-b - sq) / (2 * a)
    hi = (-b + sq) / (2 * a)
    t = np.where(ok & (lo > 1e-5), lo, np.where(ok & (hi > 1e-5), hi, np.inf))
    return t


def test_ellipsoid_hit_matches_f64_reference():
    (scene, m) = _ellipsoid_scene()
    assert scene.n_analytic == 1
    from lumo_tpu.geometry.analytic import affine_frame
    L, trans = affine_frame(m, (0.1, 0.0, -0.1), 0.8)
    rng = np.random.default_rng(3)
    n = 4096
    o = rng.uniform(-4, 4, (n, 3))
    # aim at the ellipsoid neighborhood so a solid fraction hits
    d = (trans[None, :] + rng.normal(size=(n, 3)) * 0.8) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_ref = _ray_ellipsoid_f64(L, trans, o, d)
    t, prim = trace._closest(scene, jnp.asarray(o, jnp.float32),
                             jnp.asarray(d, jnp.float32), 1e30)
    t = np.asarray(t)
    hit_e = np.asarray(prim) == scene.n_tris + scene.n_spheres  # ellipsoid id
    ref_hit = np.isfinite(t_ref)
    # the far light sphere can occlude a handful of rays; require >95%
    # agreement and tight t on agreeing rays
    agree = hit_e == ref_hit
    assert agree.mean() > 0.95
    sel = hit_e & ref_hit
    assert sel.sum() > 200
    np.testing.assert_allclose(t[sel], t_ref[sel], rtol=2e-4, atol=2e-4)


def test_ellipsoid_normal_is_implicit_gradient():
    (scene, m) = _ellipsoid_scene()
    from lumo_tpu.geometry.analytic import affine_frame
    L, trans = affine_frame(m, (0.1, 0.0, -0.1), 0.8)
    rng = np.random.default_rng(4)
    n = 512
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = -(o - trans[None, :].astype(np.float32))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = trace.intersect(scene, jnp.asarray(o), jnp.asarray(d),
                          rng=jnp.arange(n, dtype=jnp.uint32))
    sel = (np.asarray(hit["prim"]) == scene.n_tris + scene.n_spheres) \
        & np.asarray(hit["valid"])
    assert sel.sum() > 100
    p = np.asarray(hit["p"])[sel]
    ng = np.asarray(hit["ng"])[sel]
    # implicit F(p) = |L(p - trans)|² - 1: ∇F ∝ Lᵀ L (p - trans)
    grad = (p - trans) @ (L.T @ L).T
    grad /= np.linalg.norm(grad, axis=-1, keepdims=True)
    dots = np.abs(np.sum(grad * ng, axis=-1))
    assert dots.min() > 0.999
    # on-surface: |L(p-trans)| == 1
    r = np.linalg.norm((p - trans) @ L.T, axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=5e-3)


def test_uniform_transform_bakes_to_sphere():
    """Rigid + uniform scale stays on the plain sphere path."""
    from lumo_tpu.scene.instance import rotate_z, scale, translation
    m = translation(1.0, 0.5, 0.0) @ rotate_z(0.4) @ scale(2.0, 2.0, 2.0)
    sb = SceneBuilder()
    sb.add_sphere((0.2, 0.0, 0.0), 0.5, Material.diffuse((0.5, 0.5, 0.5)),
                  transform=m)
    sb.add_sphere((0.0, 50.0, 0.0), 1.0, Material.light((1.0, 1.0, 1.0)))
    scene = sb.build()
    assert scene.n_spheres == 2 and scene.n_analytic == 0
