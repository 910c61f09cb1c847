import time, dataclasses
import jax, jax.numpy as jnp
from lumo_tpu import film as film_mod
from lumo_tpu.camera import cornell_camera
from lumo_tpu.color import wavelength
from lumo_tpu.integrators import path_trace
from lumo_tpu.scene.cornell import cornell_box
from lumo_tpu.scene import trace

RES, DEPTH = 256, 6
scene = cornell_box().build()
camera = cornell_camera(resolution=(RES, RES))
n = RES * RES
wbm = jnp.asarray(film_mod.wb_matrix("DCI-P3", "CORNELL"), jnp.float32)
is_float = {k: jnp.issubdtype(v.dtype, jnp.floating) for k, v in scene.materials.items()}
mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}

def make_rays(key):
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32); py = (pix // RES).astype(jnp.float32)
    u = jax.random.uniform(key, (n, 2))
    raster = jnp.stack([px, py], -1) + u
    o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))
    lam = wavelength.sample(jax.random.uniform(jax.random.fold_in(key, 1), (n,)))
    return o, d, lam

def loss_fn(mats, key):
    materials = {k: (mats[k] if is_float[k] else scene.materials[k]) for k in scene.materials}
    scene2 = dataclasses.replace(scene, materials=materials)
    o, d, lam = make_rays(key)
    radiance, lam_out, depth = path_trace.integrate(scene2, o, d, lam, key, fixed_depth=DEPTH)
    rgb = film_mod.spectral_to_rgb(radiance, lam_out, wbm)
    return jnp.mean(rgb ** 2)

key = jax.random.PRNGKey(0)

def bench(name, f, *args, iters=10):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms")
    return dt

# forward only (scan fixed depth)
fwd = jax.jit(lambda mats, key: loss_fn(mats, key))
bench("fwd scan d6", fwd, mat_float, key)

# fwd while_loop
fwd_wl = jax.jit(lambda key: path_trace.integrate(scene, *make_rays(key), key)[0].sum())
bench("fwd while_loop", fwd_wl, key)

# fwd+bwd
fb = jax.jit(jax.value_and_grad(loss_fn))
bench("fwd+bwd scan d6", fb, mat_float, key)

# intersect only x6
def isect6(key):
    o, d, lam = make_rays(key)
    acc = 0.0
    for i in range(6):
        hit = trace.intersect(scene, o, d, key=jax.random.fold_in(key, i))
        acc = acc + hit["t"].sum()
        o = hit["p"]
    return acc
bench("intersect x6", jax.jit(isect6), key)

# one full bounce pieces: NEE occlusion
def occl6(key):
    o, d, lam = make_rays(key)
    acc = 0.0
    for i in range(6):
        occ = trace.occluded(scene, o, d, jnp.full((n,), 1.0), key=jax.random.fold_in(key, i))
        acc = acc + occ.sum()
    return acc
bench("occluded x6", jax.jit(occl6), key)
