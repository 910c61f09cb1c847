import time
import jax, jax.numpy as jnp
from lumo_tpu.camera import cornell_camera
from lumo_tpu.color import wavelength
from lumo_tpu.scene.cornell import cornell_box
from lumo_tpu.integrators import path_trace, common
from lumo_tpu.scene import trace
from lumo_tpu.bsdf import eval as bsdf

RES, DEPTH = 256, 6
scene = cornell_box().build()
camera = cornell_camera(resolution=(RES, RES))
n = RES * RES
key = jax.random.PRNGKey(0)

def make_rays(key):
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32); py = (pix // RES).astype(jnp.float32)
    u = jax.random.uniform(key, (n, 2))
    raster = jnp.stack([px, py], -1) + u
    o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))
    lam = wavelength.sample(jax.random.uniform(jax.random.fold_in(key, 1), (n,)))
    return o, d, lam

def run(tag):
    f = jax.jit(lambda key: path_trace.integrate(scene, *make_rays(key), key, fixed_depth=DEPTH)[0].sum())
    r = f(key); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(5): r = f(key)
    jax.block_until_ready(r)
    print(f"{tag}: {(time.perf_counter()-t0)/5*1e3:.1f} ms")

run("full fwd")

# ablate NEE entirely
orig_shadow = common.shadow_rays
common.shadow_rays = lambda scene, mp, wo, g, hit, lam, key: jnp.zeros_like(g)
run("no NEE")
common.shadow_rays = orig_shadow

# ablate occlusion tests inside NEE
orig_occ = trace.occluded
trace.occluded = lambda scene, o, d, t_max, key=None: jnp.zeros(o.shape[:-1], bool)
run("NEE, no occlusion")
trace.occluded = orig_occ

# ablate bsdf-sample branch B of NEE
orig_ssr = common.single_shadow_ray
def ssr_light_only(scene, mp, wo, hit, lam, key):
    N = wo.shape[0]
    k1, k2, k5 = jax.random.split(key, 3)
    u_light = jax.random.uniform(k1, (N,))
    light, pdf_light = trace.sample_light(scene, u_light)
    u_sq = jax.random.uniform(k2, (N, 2))
    wi_a = trace.sample_towards(scene, light, hit["p"], u_sq)
    wi_a = jax.lax.stop_gradient(wi_a)
    contrib_a = common._shadow_branch(scene, mp, wo, wi_a, hit, light, lam, True, k5)
    return contrib_a / jnp.maximum(pdf_light[..., None], 1e-30)
common.single_shadow_ray = ssr_light_only
run("NEE light-branch only")
common.single_shadow_ray = orig_ssr

# ablate textures in gather_params
orig_gp = bsdf.gather_params
def gp_notex(materials, mat, lam, uv, textures=None, tex_kinds=(), t=None):
    return orig_gp(materials, mat, lam, uv, None, (), t=t)
bsdf.gather_params = gp_notex
run("no textures")
bsdf.gather_params = orig_gp

# ablate uplift: constant albedo
import lumo_tpu.color.uplift as uplift_mod
orig_up = uplift_mod.sample
uplift_mod.sample = lambda coeff, lam: jnp.full(lam.shape, 0.5, lam.dtype)
run("no uplift (const albedo)")
uplift_mod.sample = orig_up

# ablate dense spectrum sampling (eta/k + emission interp)
import lumo_tpu.color.dense as dense_mod
orig_sr = dense_mod.sample_rows
dense_mod.sample_rows = lambda tab, idx, lam: jnp.ones(lam.shape, lam.dtype)
run("no dense.sample_rows")
dense_mod.sample_rows = orig_sr

# medium transmittance off
orig_tr = trace.transmittance
trace.transmittance = lambda scene, lam, t: jnp.ones(lam.shape, lam.dtype)
run("no transmittance")
trace.transmittance = orig_tr

# intersect: dense vs medium logic
orig_int = trace.intersect
def int_nomed(scene, o, d, t_max=None, key=None):
    return orig_int(scene, o, d, t_max=t_max, key=None)
trace.intersect = int_nomed
run("no medium in intersect")
trace.intersect = orig_int
