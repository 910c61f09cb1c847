"""Bisect the gap between the raw 6-bounce fwd+bwd cost (~16ms/step,
tools/prof_scan.py) and the flagship bench step (~64ms/step)."""
import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from lumo_tpu import film as film_mod
from lumo_tpu.camera import cornell_camera
from lumo_tpu.color import wavelength
from lumo_tpu.integrators import path_trace
from lumo_tpu.sampling.samplers import _hash_u32, _randfloat
from lumo_tpu.scene.cornell import cornell_box

RES = 256
N = RES * RES
K = 32
DEPTH = 6

scene = cornell_box().build()
camera = cornell_camera(resolution=(RES, RES))
wbm = jnp.asarray(film_mod.wb_matrix("DCI-P3", "CORNELL"), jnp.float32)
is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
            for k, v in scene.materials.items()}
mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}
pix = jnp.arange(N, dtype=jnp.uint32)
px = (pix % RES).astype(jnp.float32)
py = (pix // RES).astype(jnp.float32)


def make_loss(rng_mode, grad_camera, loss_mode):
    def loss_and_rays(mats, key, i):
        materials = {k: (mats[k] if is_float[k] else scene.materials[k])
                     for k in scene.materials}
        scene2 = dataclasses.replace(scene, materials=materials)
        if rng_mode == "threefry":
            u = jax.random.uniform(key, (N, 2))
            lam_u = jax.random.uniform(jax.random.fold_in(key, 1), (N,))
        else:
            s = jnp.uint32(i)
            u = jnp.stack([_randfloat(pix, s ^ jnp.uint32(0x51633E2D)),
                           _randfloat(pix, s ^ jnp.uint32(0x68BC21EB))], -1)
            lam_u = _randfloat(pix, s ^ jnp.uint32(0x02E5BE93))
        raster = jnp.stack([px, py], -1) + u
        o, d = camera.generate_ray(raster, jnp.full((N, 2), 0.5))
        if not grad_camera:
            o, d = jax.lax.stop_gradient((o, d))
        lam = wavelength.sample(lam_u)
        rk = _hash_u32(pix ^ (jnp.uint32(i) * jnp.uint32(2654435761)
                              + jnp.uint32(977)))
        radiance, lam_out, depth = path_trace.integrate(
            scene2, o, d, lam, ray_key=rk, fixed_depth=DEPTH)
        if loss_mode == "rgb":
            rgb = film_mod.spectral_to_rgb(radiance, lam_out, wbm)
            loss = jnp.mean(rgb ** 2)
        else:
            loss = jnp.mean(radiance ** 2)
        rays = jnp.sum(depth.astype(jnp.float32)) * 2.0
        return loss, rays
    return loss_and_rays


def bench(name, rng_mode, grad_camera, loss_mode, backward=True):
    loss_and_rays = make_loss(rng_mode, grad_camera, loss_mode)

    @jax.jit
    def run(mats, key):
        def one(carry, i):
            if backward:
                (loss, rays), grads = jax.value_and_grad(
                    loss_and_rays, has_aux=True, argnums=0)(
                        mats, jax.random.fold_in(key, i), i)
                acc_loss, acc_rays, acc_g = carry
                acc_g = jax.tree.map(jnp.add, acc_g, grads)
                return (acc_loss + loss, acc_rays + rays, acc_g), None
            loss, rays = loss_and_rays(mats, jax.random.fold_in(key, i), i)
            return (carry[0] + loss, carry[1] + rays, carry[2]), None
        zero_g = jax.tree.map(jnp.zeros_like, mats)
        out, _ = jax.lax.scan(one, (0.0, 0.0, zero_g), jnp.arange(K))
        # keep the grads live — returning only (loss, rays) lets XLA DCE
        # the whole backward pass
        gnorm = sum(jnp.sum(jnp.abs(g)) for g in out[2].values())
        return out[0], out[1] + 0.0 * gnorm

    key = jax.random.PRNGKey(0)
    l, r = run(mat_float, key)
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    l, r = run(mat_float, key)
    jax.block_until_ready(l)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:54s} {dt*1e3:8.2f} ms/step  ({float(r)/K/dt/1e6:6.2f} "
          f"Mrays/s)", flush=True)


def knockout_bench():
    """Stop-grad individual components to localize backward cost."""
    import jax.lax as lax
    from lumo_tpu.integrators import common
    from lumo_tpu.bsdf import eval as bsdf_eval

    orig = {}

    def wrap(mod, name):
        fn = getattr(mod, name)
        orig[(mod, name)] = fn

        def stopped(*a, **k):
            out = fn(*a, **k)
            return jax.tree.map(
                lambda x: lax.stop_gradient(x)
                if isinstance(x, jax.Array) else x, out)
        setattr(mod, name, stopped)

    def restore():
        for (mod, name), fn in orig.items():
            setattr(mod, name, fn)
        orig.clear()

    bench("KO baseline (counter, no-cam, rgb)", "counter", False, "rgb")
    wrap(common, "nee_rays")
    bench("KO nee_rays grads", "counter", False, "rgb")
    restore()
    wrap(bsdf_eval, "f_pdf")
    bench("KO f_pdf grads", "counter", False, "rgb")
    restore()
    wrap(bsdf_eval, "gather_params")
    bench("KO gather_params grads (all material deps)",
          "counter", False, "rgb")
    restore()
    import lumo_tpu.scene.trace as trace_mod
    wrap(trace_mod, "emitted")
    bench("KO emitted grads", "counter", False, "rgb")
    restore()


if __name__ == "__main__" and "--ko" in sys.argv:
    knockout_bench()
    sys.exit(0)
if __name__ == "__main__":
    bench("bench-equivalent (threefry, cam-grad, rgb)",
          "threefry", True, "rgb")
    bench("counter-rng, cam-grad, rgb", "counter", True, "rgb")
    bench("threefry, NO cam-grad, rgb", "threefry", False, "rgb")
    bench("counter-rng, NO cam-grad, rgb", "counter", False, "rgb")
    bench("counter-rng, NO cam-grad, radiance loss", "counter", False, "rad")
    bench("forward only (threefry, rgb)", "threefry", True, "rgb",
          backward=False)


