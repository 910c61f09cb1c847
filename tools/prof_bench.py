"""Micro-profile of the flagship bench workload on the real TPU.

Breaks the Cornell 256x256 fwd+bwd step into stages and times each as its
own jitted program (64-bounce-free; all stages use the same ray batch).
"""
import time

import jax
import jax.numpy as jnp

RES = 256
DEPTH = 6


def timed(fn, *args, n=3, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt * 1e3:10.2f} ms")
    return dt


def main():
    import dataclasses

    from lumo_tpu import film as film_mod
    from lumo_tpu.camera import cornell_camera
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import common, path_trace
    from lumo_tpu.scene import trace
    from lumo_tpu.scene.cornell import cornell_box
    from lumo_tpu.bsdf import eval as bsdf

    print("devices:", jax.devices())
    scene = cornell_box().build()
    camera = cornell_camera(resolution=(RES, RES))
    n = RES * RES
    key = jax.random.PRNGKey(0)
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    raster = jnp.stack([px, py], -1) + 0.5
    o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))
    lam = wavelength.sample(jax.random.uniform(key, (n,)))

    # stage: intersect only
    f_int = jax.jit(lambda o, d: trace.intersect(scene, o, d)["t"])
    timed(f_int, o, d, name="intersect (1 pass)")

    # stage: occluded only
    tmax = jnp.full((n,), 1.0)
    f_occ = jax.jit(lambda o, d: trace.occluded(scene, o, d, tmax))
    timed(f_occ, o, d, name="occluded (1 pass)")

    # stage: gather_params + bsdf sample + f + pdf
    hit = jax.jit(lambda o, d: trace.intersect(scene, o, d))(o, d)
    hit = jax.tree.map(lambda x: x, hit)

    def f_bsdf(o, d, lam):
        mp = bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"],
                                scene.textures, scene.tex_kinds, t=hit["t"])
        wo = -d
        u = jax.random.uniform(key, (n, 3))
        wi, ok, _ = bsdf.sample(mp, wo, hit["ns"], hit["backface"], lam,
                                u[:, 0], u[:, 1:])
        fv = bsdf.f(mp, wo, wi, hit["ng"], hit["ns"], hit["backface"], lam, 0)
        pv = bsdf.pdf(mp, wo, wi, hit["ng"], hit["ns"], lam)
        return fv, pv
    timed(jax.jit(f_bsdf), o, d, lam, name="bsdf gather+sample+f+pdf")

    # stage: one full NEE
    def f_nee(o, d, lam):
        mp = bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"],
                                scene.textures, scene.tex_kinds, t=hit["t"])
        return common.shadow_rays(scene, mp, -d, jnp.ones((n, 4)), hit, lam, key)
    timed(jax.jit(f_nee), o, d, lam, name="NEE shadow_rays (full)")

    # stage: full forward integrate, while_loop
    f_fwd = jax.jit(lambda o, d, lam, k: path_trace.integrate(
        scene, o, d, lam, k)[0])
    timed(f_fwd, o, d, lam, key, name="integrate fwd while_loop")

    # stage: full forward integrate fixed_depth (scan+remat)
    f_fwd_fix = jax.jit(lambda o, d, lam, k: path_trace.integrate(
        scene, o, d, lam, k, fixed_depth=DEPTH)[0])
    timed(f_fwd_fix, o, d, lam, key, name=f"integrate fwd fixed_depth={DEPTH}")

    # stage: fwd+bwd fixed_depth
    is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
                for k, v in scene.materials.items()}
    mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}

    def loss(mats, k):
        materials = {k2: (mats[k2] if is_float[k2] else scene.materials[k2])
                     for k2 in scene.materials}
        scene2 = dataclasses.replace(scene, materials=materials)
        r, lo, dep = path_trace.integrate(scene2, o, d, lam, k,
                                          fixed_depth=DEPTH)
        return jnp.mean(r ** 2)
    f_bwd = jax.jit(lambda m, k: jax.grad(loss)(m, k))
    timed(f_bwd, mat_float, key, name=f"fwd+bwd fixed_depth={DEPTH}")


if __name__ == "__main__":
    main()
