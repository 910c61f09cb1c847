"""Micro-profile of the flagship bench workload on the real TPU.

Breaks the Cornell 256x256 fwd+bwd step into stages and times each as its
own jitted program.
"""
import time

import jax
import jax.numpy as jnp

RES = 256
DEPTH = 6


def timed(fn, *args, n=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt * 1e3:10.2f} ms", flush=True)
    return dt


def main():
    import dataclasses

    from lumo_tpu.camera import cornell_camera
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import common, path_trace
    from lumo_tpu.scene import trace
    from lumo_tpu.scene.cornell import cornell_box
    from lumo_tpu.bsdf import eval as bsdf

    print("devices:", jax.devices(), flush=True)
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
    rng = (pix * jnp.uint32(2654435761) + jnp.uint32(1))

    # stage: intersect only
    f_int = jax.jit(lambda o, d: trace.intersect(scene, o, d)["t"])
    timed(f_int, o, d, name="intersect (1 pass)")

    # stage: occluded only
    tmax = jnp.full((n,), 1.0)
    f_occ = jax.jit(lambda o, d, tm: trace.occluded(scene, o, d, tm))
    timed(f_occ, o, d, tmax, name="occluded (1 pass)")

    hit = jax.jit(lambda o, d: trace.intersect(scene, o, d))(o, d)

    # stage: gather_params + sample + fused f_pdf
    def f_bsdf(o, d, lam, rngv):
        mp = bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"],
                                scene.textures, scene.tex_kinds, t=hit["t"])
        wo = -d
        from lumo_tpu.sampling.samplers import _randfloat
        u_lobe = _randfloat(rngv, jnp.uint32(3))
        u_sq = jnp.stack([_randfloat(rngv, jnp.uint32(5)),
                          _randfloat(rngv, jnp.uint32(7))], -1)
        wi, ok, _ = bsdf.sample(mp, wo, hit["ns"], hit["backface"], lam,
                                u_lobe, u_sq)
        fv, pv = bsdf.f_pdf(mp, wo, wi, hit["ng"], hit["ns"],
                            hit["backface"], lam, 0)
        return fv, pv
    timed(jax.jit(f_bsdf), o, d, lam, rng, name="bsdf gather+sample+f_pdf")

    # stage: gather_params alone
    def f_gp(lam):
        mp = bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"],
                                scene.textures, scene.tex_kinds, t=hit["t"])
        return mp["kd"], mp["eta4"]
    timed(jax.jit(f_gp), lam, name="gather_params")

    # stage: one full NEE (new single-branch)
    def f_nee(o, d, lam, rngv):
        mp = bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"],
                                scene.textures, scene.tex_kinds, t=hit["t"])
        return common.nee_rays(scene, mp, -d, jnp.ones((n, 4)), hit, lam,
                               rngv)
    timed(jax.jit(f_nee), o, d, lam, rng, name="NEE nee_rays (1 estimate)")

    # stage: emitted
    def f_emit(lam):
        return trace.emitted(scene, hit["mat"], lam, hit["uv"],
                             hit["backface"])
    timed(jax.jit(f_emit), lam, name="emitted")

    # stage: full forward integrate, while_loop
    f_fwd = jax.jit(lambda o, d, lam, rngv: path_trace.integrate(
        scene, o, d, lam, ray_key=rngv)[0])
    timed(f_fwd, o, d, lam, rng, name="integrate fwd while_loop")

    # stage: full forward integrate fixed_depth (scan+remat)
    f_fwd_fix = jax.jit(lambda o, d, lam, rngv: path_trace.integrate(
        scene, o, d, lam, ray_key=rngv, fixed_depth=DEPTH)[0])
    timed(f_fwd_fix, o, d, lam, rng, name=f"integrate fwd fixed_depth={DEPTH}")

    # stage: fwd+bwd fixed_depth
    is_float = {k: jnp.issubdtype(v.dtype, jnp.floating)
                for k, v in scene.materials.items()}
    mat_float = {k: v for k, v in scene.materials.items() if is_float[k]}

    def loss(mats, rngv):
        materials = {k2: (mats[k2] if is_float[k2] else scene.materials[k2])
                     for k2 in scene.materials}
        scene2 = dataclasses.replace(scene, materials=materials)
        r, lo, dep = path_trace.integrate(scene2, o, d, lam, ray_key=rngv,
                                          fixed_depth=DEPTH)
        return jnp.mean(r ** 2)
    f_bwd = jax.jit(lambda m, rngv: jax.grad(loss)(m, rngv))
    timed(f_bwd, mat_float, rng, name=f"fwd+bwd fixed_depth={DEPTH}")


if __name__ == "__main__":
    main()
