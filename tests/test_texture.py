"""Texture table evaluation (reference ``src/tracer/texture.rs`` semantics)."""
import jax.numpy as jnp
import numpy as np

from lumo_tpu import texture as tex_mod
from lumo_tpu.color import wavelength
from lumo_tpu.texture import Textures


def _eval(reg, ids, uv, lam=None):
    tex = reg.pack()
    n = len(ids)
    if lam is None:
        lam = wavelength.sample(jnp.linspace(0.1, 0.9, n))
    return np.asarray(tex_mod.albedo(
        tex, jnp.asarray(ids, jnp.int32), lam, jnp.asarray(uv, jnp.float32)))


def test_checkerboard_parity():
    reg = Textures()
    t = reg.checkerboard((1.0, 1.0, 1.0), (0.0, 0.0, 0.0), 2.0)
    # scale 2: uv in [0, .5) → parity 0 → white; [0.5, 1) x [0, .5) → black
    uv = [[0.1, 0.1], [0.7, 0.1], [0.7, 0.7], [0.1, 0.7]]
    v = _eval(reg, [t] * 4, uv)
    assert v[0].mean() > 0.8 and v[2].mean() > 0.8
    assert v[1].mean() < 0.05 and v[3].mean() < 0.05


def test_checkerboard_nested():
    reg = Textures()
    inner = reg.checkerboard((1.0, 0.0, 0.0), (0.0, 0.0, 1.0), 4.0)
    t = reg.checkerboard(inner, (0.0, 0.0, 0.0), 2.0)
    v = _eval(reg, [t] * 2, [[0.1, 0.1], [0.7, 0.1]])
    assert v[0].mean() > 0.01   # resolved to inner (nonblack)
    assert v[1].mean() < 0.05   # outer black


def test_marble_range_and_determinism():
    reg = Textures()
    t = reg.marble((0.8, 0.8, 0.8))
    uv = np.random.default_rng(0).uniform(size=(64, 2))
    v1 = _eval(reg, [t] * 64, uv)
    v2 = _eval(reg, [t] * 64, uv)
    np.testing.assert_array_equal(v1, v2)
    assert (v1 >= 0).all() and (v1 <= 1.0).all()
    assert v1.std() > 0.01      # actually varies


def test_image_texture_bilinear():
    reg = Textures()
    img = np.zeros((2, 2, 3))
    img[0, 0] = [1.0, 0.0, 0.0]   # top-left red
    img[1, 1] = [0.0, 1.0, 0.0]   # bottom-right green
    t = reg.image(img)
    lam = jnp.full((2, 4), 550.0)   # green-ish wavelength
    # v flipped: v≈1 → top row; interior uvs (wrap maps u=1.0 → 0.0)
    v = _eval(reg, [t] * 2, [[0.01, 0.99], [0.99, 0.01]], lam)
    # at 550nm green reflects strongly, red weakly
    assert v[1].mean() > v[0].mean() + 0.2


def test_mandelbrot():
    reg = Textures()
    t = reg.mandelbrot()
    # uv (0.75, 0.5) → c = 0 → inside (white); uv (0, 0) → c far → escape
    v = _eval(reg, [t] * 2, [[0.75, 0.5], [0.0, 0.0]])
    assert v[0].min() > 0.9
    assert v[1].max() < 0.1


def test_invalid_id_is_one():
    reg = Textures()
    reg.solid((0.5, 0.5, 0.5))
    v = _eval(reg, [-1], [[0.5, 0.5]])
    np.testing.assert_allclose(v, 1.0)


def test_normal_map():
    reg = Textures()
    reg.solid((1, 1, 1))
    n = np.zeros((4, 4, 3))
    n[..., 2] = 1.0
    n[:2, :, 0] = 0.5
    n[:2, :, 2] = np.sqrt(1 - 0.25)
    nm = reg.normal_map(n)
    tex = reg.pack()
    out = np.asarray(tex_mod.normal_at(
        tex, jnp.asarray([nm, nm, -1], jnp.int32),
        jnp.asarray([[0.1, 0.9], [0.1, 0.1], [0.5, 0.5]], jnp.float32)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    assert abs(out[0, 0] - 0.5) < 0.05     # top rows tilted (v=0.9 → row 0)
    assert abs(out[1, 0]) < 0.05           # bottom rows flat
    np.testing.assert_allclose(out[2], [0, 0, 1], atol=1e-6)


def test_textured_material_render():
    """Render smoke: checkerboard floor in the empty box."""
    import jax

    from lumo_tpu.camera import build_camera
    from lumo_tpu.integrators import path_trace
    from lumo_tpu.scene.cornell import empty_box
    from lumo_tpu.scene.materials import Material

    sb = empty_box((0.9, 0.9, 0.9), Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    checker = sb.textures.checkerboard((1.0, 1.0, 1.0), (0.05, 0.05, 0.05), 8.0)
    sb.add_rectangle([-1, -0.79, 0], [-1, -0.79, -2], [1, -0.79, -2],
                     Material.diffuse((1, 1, 1), kd_tex=checker))
    scene = sb.build()
    assert scene.tex_kinds == (0, 1)
    cam = build_camera(resolution=(16, 16))
    n = 256
    pix = jnp.arange(n, dtype=jnp.uint32)
    raster = jnp.stack([(pix % 16) + 0.5, (pix // 16) + 0.5], -1).astype(jnp.float32)
    o, d = cam.generate_ray(raster, jnp.full((n, 2), 0.5))
    lam = wavelength.sample(jnp.linspace(0.01, 0.99, n))
    rad, lam_out, depth = path_trace.integrate(
        scene, o, d, lam, jax.random.PRNGKey(0), fixed_depth=3)
    assert bool(jnp.isfinite(rad).all())
