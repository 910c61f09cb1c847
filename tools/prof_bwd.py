"""Backward-sweep cost exploration for the flagship Cornell fwd+bwd bench.

The r3 verdict: fwd-only 23.4M rays/s, fwd+bwd 3.9M — the backward sweep
costs ~6x the forward pass.  This tool measures fwd+bwd throughput across
remat policies and gradient-accumulation batchings on the live backend to
pick the production configuration (results feed path_trace.integrate's
default and bench.py).

Run: python tools/prof_bwd.py [policy ...]
"""
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
from lumo_tpu.scene.cornell import cornell_box

RES = 256
SPP = 64
DEPTH = 6

POLICIES = {
    "geom": lambda: jax.checkpoint_policies.save_only_these_names("geom"),
    "nothing": lambda: jax.checkpoint_policies.nothing_saveable,
    "everything": lambda: jax.checkpoint_policies.everything_saveable,
    "dots": lambda: jax.checkpoint_policies.dots_saveable,
}


def run(policy_name="geom", spp_per_step=1, n_rays=RES * RES):
    scene = cornell_box().build()
    camera = cornell_camera(resolution=(RES, RES))
    wbm = jnp.asarray(film_mod.wb_matrix("DCI-P3", "CORNELL"), jnp.float32)
    is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
                for k, v in scene.materials.items()}
    mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}
    policy = POLICIES[policy_name]()
    n = n_rays

    def loss_and_rays(mats, key):
        materials = {k: (mats[k] if is_float[k] else scene.materials[k])
                     for k in scene.materials}
        scene2 = dataclasses.replace(scene, materials=materials)
        pix = jnp.arange(n, dtype=jnp.uint32)
        px = (pix % RES).astype(jnp.float32)
        py = ((pix // RES) % RES).astype(jnp.float32)
        u = jax.random.uniform(key, (n, 2))
        raster = jnp.stack([px, py], -1) + u
        o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))
        lam = wavelength.sample(
            jax.random.uniform(jax.random.fold_in(key, 1), (n,)))
        radiance, lam_out, depth = path_trace.integrate(
            scene2, o, d, lam, key, fixed_depth=DEPTH, remat_policy=policy)
        rgb = film_mod.spectral_to_rgb(radiance, lam_out, wbm)
        loss = jnp.mean(rgb ** 2)
        rays = jnp.sum(depth.astype(jnp.float32)) * 2.0
        return loss, rays

    steps = SPP * (RES * RES) // (spp_per_step * n)

    @jax.jit
    def render(mats, key):
        def one(carry, i):
            (loss, rays), grads = jax.value_and_grad(
                loss_and_rays, has_aux=True)(mats, jax.random.fold_in(key, i))
            acc_loss, acc_rays, acc_g = carry
            acc_g = jax.tree.map(jnp.add, acc_g, grads)
            return (acc_loss + loss, acc_rays + rays, acc_g), None
        zero_g = jax.tree.map(jnp.zeros_like, mats)
        (loss, rays, grads), _ = jax.lax.scan(
            one, (0.0, 0.0, zero_g), jnp.arange(steps))
        return loss, rays, sum(jnp.sum(jnp.abs(g)) for g in grads.values())

    key = jax.random.PRNGKey(42)
    t_c0 = time.perf_counter()
    loss, rays, gn = render(mat_float, key)
    loss.block_until_ready()
    compile_s = time.perf_counter() - t_c0
    best = 0.0
    for i in range(2):
        t0 = time.perf_counter()
        loss, rays, gn = render(mat_float, jax.random.fold_in(key, i))
        loss.block_until_ready()
        best = max(best, float(rays) / (time.perf_counter() - t0))
    return best, compile_s


if __name__ == "__main__":
    jobs = []
    for arg in (sys.argv[1:] or ["geom"]):
        parts = arg.split(":")
        name = parts[0]
        spp_step = int(parts[1]) if len(parts) > 1 else 1
        nr = int(parts[2]) if len(parts) > 2 else RES * RES
        jobs.append((name, spp_step, nr))
    for name, spp_step, nr in jobs:
        try:
            r, cs = run(name, spp_step, nr)
            print(f"{name} spp/step={spp_step} rays/step={nr}: "
                  f"{r:,.0f} rays/s (compile {cs:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — exploration tool
            print(f"{name} spp/step={spp_step} rays/step={nr}: FAILED {e}",
                  flush=True)
