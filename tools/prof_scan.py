"""Honest per-component costs on the live backend: every candidate runs
K times inside ONE jitted lax.scan, so tunnel dispatch latency amortizes
away and XLA sees the same steady-state context as the production render
loop."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

N = 256 * 256
K = 48


def timed_scan(step, init, name):
    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None, length=K)
        return out
    out = run(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(f"{name:52s} {dt * 1e3:9.3f} ms/iter", flush=True)
    return dt


def main():
    from lumo_tpu.camera import cornell_camera
    from lumo_tpu.color import wavelength
    from lumo_tpu.scene import trace
    from lumo_tpu.scene.cornell import cornell_box
    from lumo_tpu.integrators import common
    from lumo_tpu.bsdf import eval as bsdf
    from lumo_tpu.sampling.samplers import _hash_u32, _randfloat

    scene = cornell_box().build()
    camera = cornell_camera(resolution=(256, 256))
    pix = jnp.arange(N, dtype=jnp.uint32)
    px = (pix % 256).astype(jnp.float32)
    py = (pix // 256).astype(jnp.float32)
    o, d = camera.generate_ray(jnp.stack([px, py], -1) + 0.5,
                               jnp.full((N, 2), 0.5))
    lam = wavelength.sample(jax.random.uniform(jax.random.PRNGKey(1), (N,)))
    rng = _hash_u32(pix)

    def perturb(oo, dd):
        # rotate d slightly so the scan carry changes every iteration
        dd = dd + 1e-4
        dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
        return oo, dd

    def s_intersect(c):
        oo, dd = c
        hit = trace.intersect(scene, oo, dd, rng=rng, salt=jnp.uint32(1))
        return perturb(oo + 1e-6 * hit["p"], dd)

    timed_scan(s_intersect, (o, d), "trace.intersect (closest + detail)")

    def s_closest(c):
        oo, dd = c
        t, prim = trace._closest(scene, oo, dd, jnp.inf)
        return perturb(oo + 1e-6 * t[..., None], dd)

    timed_scan(s_closest, (o, d), "trace._closest only")

    def s_gather(c):
        oo, dd = c
        hit = trace.intersect(scene, oo, dd, rng=rng, salt=jnp.uint32(1))
        mp = bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"],
                                scene.textures, scene.tex_kinds, t=hit["t"])
        return perturb(oo + 1e-6 * mp["kd"][..., :3], dd)

    timed_scan(s_gather, (o, d), "intersect + gather_params")

    def s_nee(c):
        oo, dd = c
        hit = trace.intersect(scene, oo, dd, rng=rng, salt=jnp.uint32(1))
        mp = bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"],
                                scene.textures, scene.tex_kinds, t=hit["t"])
        nee = common.nee_rays(scene, mp, -dd, jnp.ones((N, 4)), hit, lam, rng)
        return perturb(oo + 1e-6 * nee[..., :3], dd)

    timed_scan(s_nee, (o, d), "intersect + gather + nee_rays")

    def s_fpdf(c):
        oo, dd = c
        hit = trace.intersect(scene, oo, dd, rng=rng, salt=jnp.uint32(1))
        mp = bsdf.gather_params(scene.materials, hit["mat"], lam, hit["uv"],
                                scene.textures, scene.tex_kinds, t=hit["t"])
        u_sq = jnp.stack([_randfloat(rng, jnp.uint32(3)),
                          _randfloat(rng, jnp.uint32(4))], -1)
        wi, ok, _ = bsdf.sample(mp, -dd, hit["ns"], hit["backface"], lam,
                                _randfloat(rng, jnp.uint32(5)), u_sq)
        f, p = bsdf.f_pdf(mp, -dd, wi, hit["ng"], hit["ns"], hit["backface"],
                          lam)
        return perturb(oo + 1e-6 * f[..., :3], dd)

    timed_scan(s_fpdf, (o, d), "intersect + gather + sample + f_pdf")

    from lumo_tpu.integrators import path_trace

    def s_full(c):
        oo, dd = c
        r, lo, dep = path_trace.integrate(scene, oo, dd, lam, ray_key=rng,
                                          fixed_depth=1)
        return perturb(oo + 1e-6 * r[..., :3], dd)

    timed_scan(s_full, (o, d), "full bounce body (fixed_depth=1)")

    def s_full6(c):
        oo, dd = c
        r, lo, dep = path_trace.integrate(scene, oo, dd, lam, ray_key=rng,
                                          fixed_depth=6)
        return perturb(oo + 1e-6 * r[..., :3], dd)

    timed_scan(s_full6, (o, d), "6-bounce forward")

    mats = {k: v for k, v in scene.materials.items()
            if jnp.issubdtype(v.dtype, jnp.floating)}

    def s_grad6(c):
        import dataclasses
        oo, dd = c

        def loss(mf):
            m2 = dict(scene.materials)
            m2.update(mf)
            s2 = dataclasses.replace(scene, materials=m2)
            r, lo, dep = path_trace.integrate(s2, oo, dd, lam, ray_key=rng,
                                              fixed_depth=6)
            return jnp.sum(r) * 1e-6
        g = jax.grad(loss)(mats)
        return perturb(oo + 1e-9 * g["kd"][0, :3], dd)

    timed_scan(s_grad6, (o, d), "6-bounce fwd+bwd (material grads)")


if __name__ == "__main__":
    main()
