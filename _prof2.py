import time
import jax, jax.numpy as jnp
from lumo_tpu.camera import cornell_camera
from lumo_tpu.color import wavelength, space
from lumo_tpu.scene.cornell import cornell_box
from lumo_tpu.scene import trace
from lumo_tpu.bsdf import eval as bsdf
from lumo_tpu.integrators import common

RES = 256
scene = cornell_box().build()
camera = cornell_camera(resolution=(RES, RES))
n = RES * RES
key = jax.random.PRNGKey(0)

pix = jnp.arange(n, dtype=jnp.uint32)
px = (pix % RES).astype(jnp.float32); py = (pix // RES).astype(jnp.float32)
u = jax.random.uniform(key, (n, 2))
raster = jnp.stack([px, py], -1) + u
o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))
lam = wavelength.sample(jax.random.uniform(jax.random.fold_in(key, 1), (n,)))

hit = jax.jit(lambda o, d: trace.intersect(scene, o, d, key=key))(o, d)
jax.block_until_ready(hit)
wo = -d

def bench(name, f, *args, iters=20):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3*6:.1f} ms (x6)")

gp = jax.jit(lambda: bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"], scene.textures, scene.tex_kinds, t=hit["t"]))
bench("gather_params", gp)
mp = gp(); jax.block_until_ready(mp)

u_lobe = jax.random.uniform(key, (n,))
u_sq = jax.random.uniform(key, (n, 2))
samp = jax.jit(lambda: bsdf.sample(mp, wo, hit["ns"], hit["backface"], lam, u_lobe, u_sq))
bench("bsdf.sample", samp)
wi, ok, _ = samp(); jax.block_until_ready(wi)

bench("bsdf.f", jax.jit(lambda: bsdf.f(mp, wo, wi, hit["ng"], hit["ns"], hit["backface"], lam, 0)))
bench("bsdf.pdf", jax.jit(lambda: bsdf.pdf(mp, wo, wi, hit["ng"], hit["ns"], lam)))
g1 = jnp.ones((n, 4))
bench("shadow_rays", jax.jit(lambda: common.shadow_rays(scene, mp, wo, g1, hit, lam, key)))
bench("emitted", jax.jit(lambda: trace.emitted(scene, hit["mat"], lam, hit["uv"], hit["backface"])))
bench("transmittance", jax.jit(lambda: trace.transmittance(scene, lam, hit["t"])))
bench("luminance", jax.jit(lambda: space.luminance(g1, lam)))
bench("rng split+uniforms", jax.jit(lambda k: (jax.random.uniform(jax.random.split(k, 6)[0], (n,)), jax.random.uniform(jax.random.split(k, 6)[1], (n, 2)))), key)
bench("wavelength.terminate+dispersive", jax.jit(lambda: wavelength.terminate(lam, bsdf.dispersive_mask(scene.materials, hit["mat"]))))
