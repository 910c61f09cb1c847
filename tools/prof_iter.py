"""Component-level timing of one stream-wavefront iteration on the
bench BVH scene (327k-tri blob in an empty Cornell box, 262k lanes):
closest hit, shadow any-hit, the full hit record + shading, sampling,
and the regen/fold machinery — where does the iteration time go?"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from lumo_tpu.camera import build_camera
from lumo_tpu.color import wavelength
from lumo_tpu.scene import shapes, trace
from lumo_tpu.scene.cornell import empty_box
from lumo_tpu.scene.instance import Mesh
from lumo_tpu.scene.materials import Material

N = 262144


def timed(fn, *args, n=4, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    real = best - 0.0250
    print(f"{name:44s} {best * 1e3:9.2f} ms (real {real * 1e3:8.2f})  "
          f"{N / real / 1e6:7.2f} Mlanes/s", flush=True)
    return best


def main():
    sb = empty_box((0.95, 0.95, 0.95),
                   Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    mesh = Mesh(v, f, normals=vn)
    mat = Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0)
    (mesh.to_unit_size().to_origin().set_y(-0.799).translate(0.0, 0.0, -1.5)
     .add_to(sb, mat))
    scene = sb.build()
    camera = build_camera(resolution=(256, 256))

    rng = np.random.default_rng(0)
    pix = rng.integers(0, 65536, N).astype(np.uint32)
    px = (pix % 256).astype(np.float32)
    py = (pix // 256).astype(np.float32)
    raster = jnp.asarray(np.stack([px, py], -1) + 0.5)
    o, d = camera.generate_ray(raster, jnp.full((N, 2), 0.5))
    lam = wavelength.sample(jax.random.uniform(jax.random.PRNGKey(3), (N,)))
    key = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))

    # primary hits -> bounce-class rays for timing
    t1, p1 = jax.jit(lambda o, d: trace._closest(scene, o, d, 1e30))(o, d)
    hitp = jnp.clip(o + t1[:, None] * d, -3, 3)
    dd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    ob = hitp + 1e-4 * dd

    timed(jax.jit(lambda o, d: trace._closest(scene, o, d, 1e30)), ob, dd,
          name="_closest (bounce mix)")
    tm = jnp.full((N,), 2.0, jnp.float32)
    timed(jax.jit(lambda o, d, tm: trace.occluded(scene, o, d, tm)),
          ob, dd, tm, name="trace.occluded (shadow)")

    hit_fn = jax.jit(lambda o, d: trace.intersect(scene, o, d, key=key))
    try:
        timed(hit_fn, ob, dd, name="trace.intersect (closest + record)")
    except Exception as e:  # noqa: BLE001
        print(f"trace.intersect skipped: {type(e).__name__}: {e}"[:200])

    from lumo_tpu.integrators import path_trace

    def gen(idx):
        p = (idx % 65536).astype(jnp.uint32)
        gx = (p % 256).astype(jnp.float32)
        gy = (p // 256).astype(jnp.float32)
        rr = jnp.stack([gx, gy], -1) + 0.5
        oo, dd2 = camera.generate_ray(rr, jnp.full(rr.shape, 0.5))
        ll = wavelength.sample(jnp.full(p.shape, 0.37))
        return {"o": oo, "d": dd2, "lam": ll, "rng": p}

    def fold(acc, term, st):
        return acc + jnp.sum(jnp.where(term, st["depth"], 0)) * 2.0

    for spp_mult in (8,):
        ns = N * spp_mult

        @jax.jit
        def fwd():
            return path_trace.integrate_stream(
                scene, gen, fold, jnp.zeros((), jnp.float32), N, ns)

        r = fwd()
        r.block_until_ready()
        t0 = time.perf_counter()
        r = fwd()
        r.block_until_ready()
        el = time.perf_counter() - t0
        print(f"stream {ns} samples: {el * 1e3:.1f} ms  "
              f"{float(r) / el / 1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
