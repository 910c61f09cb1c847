"""End-to-end render + differentiability tests on a tiny Cornell box.

Covers the BASELINE quality requirements: sane radiometry, left/right
wall colors, and finite-difference gradient checks of the differentiable
path (detached sampling keeps the estimator deterministic per key, so FD
on the same key is exact up to float precision).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.camera import cornell_camera
from lumo_tpu.color import wavelength
from lumo_tpu.integrators import path_trace
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.cornell import cornell_box


@pytest.fixture(scope="module")
def scene():
    return cornell_box().build()


def test_cornell_render_smoke(scene):
    camera = cornell_camera(resolution=(32, 32))
    img = (Renderer(scene, camera).samples(8).integrator("path")
           .illuminant("CORNELL").seed(1).render(verbose=False))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # out-of-gamut spectral colors can dip slightly negative in RGB;
    # clamping happens at encode time (like the reference)
    assert img.min() > -0.05
    assert img.mean() > 0.01, "image should not be black"
    # left third (high x in world = low raster x? camera looks +z with x
    # flipped) — just check the two halves differ in hue: one reddish, one
    # greenish
    left = img[8:24, :8].mean(axis=(0, 1))
    right = img[8:24, -8:].mean(axis=(0, 1))
    r_ratio_left = left[0] / (left[1] + 1e-9)
    r_ratio_right = right[0] / (right[1] + 1e-9)
    assert (r_ratio_left > 1.2 * r_ratio_right) or (r_ratio_right > 1.2 * r_ratio_left)


def test_direct_light_render_smoke(scene):
    camera = cornell_camera(resolution=(16, 16))
    img = (Renderer(scene, camera).samples(4).integrator("direct")
           .illuminant("CORNELL").seed(2).render(verbose=False))
    assert np.isfinite(img).all() and img.mean() > 0.001


def _loss_fn(scene, camera, key, n=64):
    pix = jnp.arange(n, dtype=jnp.uint32)
    raster = jnp.stack([(pix % 8) + 0.5, (pix // 8) + 0.5], -1).astype(jnp.float32)
    lam = wavelength.sample(jax.random.uniform(key, (n,)))
    o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))

    def loss(mat_float, is_float):
        mats = {k: (mat_float[k] if is_float[k] else scene.materials[k])
                for k in scene.materials}
        s2 = dataclasses.replace(scene, materials=mats)
        r, _, _ = path_trace.integrate(s2, o, d, lam, key, fixed_depth=4)
        return jnp.sum(r)

    return loss


def test_gradients_finite_and_match_fd(scene):
    camera = cornell_camera(resolution=(8, 8))
    key = jax.random.PRNGKey(7)
    is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
                for k, v in scene.materials.items()}
    mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}
    loss = _loss_fn(scene, camera, key)
    lfn = jax.jit(lambda mf: loss(mf, is_float))
    val, grads = jax.value_and_grad(lfn)(mat_float)
    assert np.isfinite(float(val))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), f"NaN grad in {k}"
    assert float(jnp.abs(grads["kd"]).sum()) > 0.0
    assert float(jnp.abs(grads["emit_scale"]).sum()) > 0.0

    # finite differences on emit_scale of the light material (last index
    # with nonzero grad)
    es = np.asarray(mat_float["emit_scale"])
    gi = np.asarray(grads["emit_scale"])
    idx = int(np.argmax(np.abs(gi)))
    eps = 1e-3
    for sign in (+1,):
        up = dict(mat_float)
        up["emit_scale"] = jnp.asarray(es).at[idx].add(eps)
        dn = dict(mat_float)
        dn["emit_scale"] = jnp.asarray(es).at[idx].add(-eps)
        fd = (float(lfn(up)) - float(lfn(dn))) / (2 * eps)
    assert fd == pytest.approx(float(gi[idx]), rel=0.05), (fd, float(gi[idx]))

    # FD on a kd coefficient (scale channel of the white wall material)
    kd = np.asarray(mat_float["kd"])
    gkd = np.asarray(grads["kd"])
    ij = np.unravel_index(int(np.argmax(np.abs(gkd))), gkd.shape)
    eps = 1e-3
    up = dict(mat_float)
    up["kd"] = jnp.asarray(kd).at[ij].add(eps)
    dn = dict(mat_float)
    dn["kd"] = jnp.asarray(kd).at[ij].add(-eps)
    fd = (float(lfn(up)) - float(lfn(dn))) / (2 * eps)
    assert fd == pytest.approx(float(gkd[ij]), rel=0.08), (fd, float(gkd[ij]))


def test_rebuild_light_alias(scene):
    """Alias-table refresh after emission edits (VERDICT r4 hygiene):
    unchanged materials reproduce the baked pdf; doubling one light's
    emit_scale re-weights selection toward it."""
    import dataclasses
    s2 = scene.rebuild_light_alias()
    np.testing.assert_allclose(np.asarray(s2.light_pdf),
                               np.asarray(scene.light_pdf), rtol=1e-5)

    # boost one light material's emission 4x: its prims' share must rise
    mats = dict(scene.materials)
    es = np.asarray(mats["emit_scale"]).copy()
    lm = np.asarray(scene.tri_mat)[np.asarray(scene.light_prim)[0]]
    es[lm] *= 4.0
    mats["emit_scale"] = jnp.asarray(es)
    s3 = dataclasses.replace(scene, materials=mats).rebuild_light_alias()
    old = np.asarray(scene.light_pdf)
    new = np.asarray(s3.light_pdf)
    boosted = np.asarray(scene.tri_mat)[
        np.asarray(scene.light_prim)] == lm
    if boosted.all():
        np.testing.assert_allclose(new, old, rtol=1e-5)  # renormalizes away
    else:
        assert new[boosted].sum() > old[boosted].sum()
    np.testing.assert_allclose(new.sum(), 1.0, rtol=1e-5)
