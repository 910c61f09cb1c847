"""Bisect the cost of trace.intersect on the Cornell scene."""
import time

import jax
import jax.numpy as jnp

RES = 256


def timed(fn, *args, n=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    from lumo_tpu.camera import cornell_camera
    from lumo_tpu.geometry import intersect as geo
    from lumo_tpu.scene import trace
    from lumo_tpu.scene.cornell import cornell_box

    scene = cornell_box().build()
    print("n_tris", scene.n_tris, "n_spheres", scene.n_spheres,
          "medium", scene.medium is not None, "bvh", scene.bvh is not None)
    camera = cornell_camera(resolution=(RES, RES))
    n = RES * RES
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % RES).astype(jnp.float32)
    py = (pix // RES).astype(jnp.float32)
    raster = jnp.stack([px, py], -1) + 0.5
    o, d = camera.generate_ray(raster, jnp.full((n, 2), 0.5))

    # 1. ray_setup only
    timed(jax.jit(lambda d: geo.ray_setup(d)), d, name="ray_setup")

    # 2. triangle_t full sweep
    def f_tri(o, d):
        kz, shear = geo.ray_setup(d)
        t, _, _ = geo.triangle_t(o, kz, shear, scene.tri_a[None],
                                 scene.tri_b[None], scene.tri_c[None],
                                 0.0, jnp.inf)
        return t
    timed(jax.jit(f_tri), o, d, name="triangle_t sweep (N,T)")

    # 3. _closest (argmin included)
    timed(jax.jit(lambda o, d: trace._closest(scene, o, d, jnp.inf)), o, d,
          name="_closest")

    # 4. triangle_detail on gathered prims
    def f_det(o, d):
        t, prim = trace._closest(scene, o, d, jnp.inf)
        tidx = jnp.clip(prim, 0, scene.n_tris - 1)
        g = lambda arr: arr[tidx]
        return geo.triangle_detail(o, d, g(scene.tri_a), g(scene.tri_b),
                                   g(scene.tri_c), g(scene.tri_na),
                                   g(scene.tri_nb), g(scene.tri_nc),
                                   g(scene.tri_uva), g(scene.tri_uvb),
                                   g(scene.tri_uvc))["p"]
    timed(jax.jit(f_det), o, d, name="_closest + detail")

    # 5. full intersect
    timed(jax.jit(lambda o, d: trace.intersect(scene, o, d)["t"]), o, d,
          name="intersect full")

    # 6. offset_ray_origin (nextafter)
    hit = jax.jit(lambda o, d: trace.intersect(scene, o, d))(o, d)
    timed(jax.jit(lambda: geo.offset_ray_origin(hit["p"], hit["err"],
                                                hit["ng"], d)),
          name="offset_ray_origin")

    # 7. emitted
    timed(jax.jit(lambda: trace.emitted(scene, hit["mat"],
                                        jnp.full((n, 4), 550.0), hit["uv"],
                                        hit["backface"])),
          name="emitted")


if __name__ == "__main__":
    main()
