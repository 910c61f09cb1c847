"""Profile bench structure: per-launch overhead vs in-jit spp scan."""
import dataclasses
import time

import jax
import jax.numpy as jnp

from lumo_tpu import film as film_mod
from lumo_tpu.camera import cornell_camera
from lumo_tpu.color import wavelength
from lumo_tpu.integrators import path_trace
from lumo_tpu.scene.cornell import cornell_box

RES = 256
DEPTH = 6

scene = cornell_box().build()
camera = cornell_camera(resolution=(RES, RES))
n = RES * RES
wbm = jnp.asarray(film_mod.wb_matrix("DCI-P3", "CORNELL"), jnp.float32)
is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
            for k, v in scene.materials.items()}
mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}


def loss_and_rays(mats, key):
    materials = {k: (mats[k] if is_float[k] else scene.materials[k])
                 for k in scene.materials}
    scene2 = dataclasses.replace(scene, materials=materials)
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    u = jax.random.uniform(key, (n, 2))
    raster = jnp.stack([px, py], -1) + u
    o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))
    lam = wavelength.sample(
        jax.random.uniform(jax.random.fold_in(key, 1), (n,)))
    radiance, lam_out, depth = path_trace.integrate(
        scene2, o, d, lam, key, fixed_depth=DEPTH)
    rgb = film_mod.spectral_to_rgb(radiance, lam_out, wbm)
    loss = jnp.mean(rgb ** 2)
    rays = jnp.sum(depth.astype(jnp.float32)) * 2.0
    return loss, rays


@jax.jit
def spp_step(mats, key):
    (loss, rays), grads = jax.value_and_grad(
        loss_and_rays, has_aux=True)(mats, key)
    gnorm = sum(jnp.sum(jnp.abs(g)) for g in grads.values())
    return loss, rays, gnorm


@jax.jit
def fwd_only(mats, key):
    loss, rays = loss_and_rays(mats, key)
    return loss, rays


def scanned(n_spp):
    @jax.jit
    def run(mats, key):
        def one(carry, i):
            (loss, rays), grads = jax.value_and_grad(
                loss_and_rays, has_aux=True)(mats, jax.random.fold_in(key, i))
            acc_loss, acc_rays = carry
            return (acc_loss + loss, acc_rays + rays), None
        (loss, rays), _ = jax.lax.scan(one, (0.0, 0.0),
                                       jnp.arange(n_spp))
        return loss, rays
    return run


key = jax.random.PRNGKey(42)

# warmup + time single launches
loss, rays, g = spp_step(mat_float, key); loss.block_until_ready()
t0 = time.perf_counter()
R = 0.0
for s in range(8):
    loss, rays, g = spp_step(mat_float, jax.random.fold_in(key, s))
    R += float(rays)
loss.block_until_ready()
dt = time.perf_counter() - t0
print(f"host-loop fwd+bwd: {dt/8*1000:.1f} ms/spp  {R/dt/1e6:.2f} Mray/s")

loss, rays = fwd_only(mat_float, key); loss.block_until_ready()
t0 = time.perf_counter()
R = 0.0
for s in range(8):
    loss, rays = fwd_only(mat_float, jax.random.fold_in(key, s))
    R += float(rays)
loss.block_until_ready()
dt = time.perf_counter() - t0
print(f"host-loop fwd-only: {dt/8*1000:.1f} ms/spp  {R/dt/1e6:.2f} Mray/s")

run8 = scanned(8)
loss, rays = run8(mat_float, key); loss.block_until_ready()
t0 = time.perf_counter()
loss, rays = run8(mat_float, jax.random.fold_in(key, 99))
loss.block_until_ready()
dt = time.perf_counter() - t0
print(f"scan8 fwd+bwd: {dt/8*1000:.1f} ms/spp  {float(rays)/dt/1e6:.2f} Mray/s")
