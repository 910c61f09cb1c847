"""Adaptive Russian-roulette delta from running per-pixel statistics
(reference ``renderer/task.rs:42-53``)."""
import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu.camera import cornell_camera
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.cornell import cornell_box

RES = 16


def _mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_stats_accumulate_and_delta_adapts():
    scene = cornell_box().build()
    camera = cornell_camera(resolution=(RES, RES))
    r = Renderer(scene, camera).samples(4).batch_samples(2).seed(1).devices(1)
    step = r._make_step(2, 4)
    film = __import__("lumo_tpu.film", fromlist=["new_film"]).new_film((RES, RES))
    stats = Renderer.new_stats(RES * RES)
    key = jax.random.PRNGKey(1)
    film, stats, rays1 = step(film, stats, key, jnp.uint32(0))
    assert float(jnp.sum(stats["n"])) == 2 * RES * RES
    assert float(jnp.sum(stats["cost"])) > 0
    # second batch consumes the stats (per-pixel delta now varies)
    film, stats, rays2 = step(film, stats, jax.random.fold_in(key, 1),
                              jnp.uint32(2))
    var = np.asarray(stats["f2"] - stats["f"] ** 2 / jnp.maximum(stats["n"], 1))
    assert (var > 0).any()  # lit pixels have sample variance


def test_adaptive_rr_unbiased_vs_fixed():
    """Adaptive RR changes variance, not the estimator's mean: a
    multi-batch adaptive render agrees with the fixed-delta render of the
    same scene within Monte-Carlo noise."""
    scene = cornell_box().build()
    camera = cornell_camera(resolution=(RES, RES))
    img_ad = (Renderer(scene, camera).samples(32).batch_samples(8)
              .seed(7).devices(1).render(verbose=False))
    img_fx = (Renderer(scene, camera).samples(32).batch_samples(8)
              .seed(7).devices(1).fixed_rr_delta(1.0).render(verbose=False))
    assert np.all(np.isfinite(img_ad))
    # identical until RR depth, so the images differ only through deep
    # bounces — means must agree closely
    ma, mf = img_ad.mean(), img_fx.mean()
    assert abs(ma - mf) / max(mf, 1e-9) < 0.05
    # the adaptive thresholds are tiny vs delta=1 (sqrt(var/cost) << 1 on
    # Cornell), so RR kills fewer deep paths -> equal-spp variance cannot
    # be (meaningfully) worse
    ref = (Renderer(scene, camera).samples(128).seed(99).devices(1)
           .render(verbose=False))
    assert _mse(img_ad, ref) <= _mse(img_fx, ref) * 1.15
