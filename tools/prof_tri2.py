"""Test: does unpacked-component triangle_t fuse better than stacked?"""
import time

import jax
import jax.numpy as jnp

N = 256 * 256
INF = jnp.inf


def timed(fn, *args, n=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    from lumo_tpu.camera import cornell_camera
    from lumo_tpu.geometry import intersect as geo
    from lumo_tpu.scene.cornell import cornell_box

    scene = cornell_box().build()
    camera = cornell_camera(resolution=(256, 256))
    pix = jnp.arange(N, dtype=jnp.uint32)
    px = (pix % 256).astype(jnp.float32)
    py = (pix // 256).astype(jnp.float32)
    raster = jnp.stack([px, py], -1) + 0.5
    o, d = camera.generate_ray(raster, jnp.full((N, 2), 0.5))

    def f_old(o, d):
        kz, shear = geo.ray_setup(d)
        t, _, _ = geo.triangle_t(o, kz, shear, scene.tri_a[None],
                                 scene.tri_b[None], scene.tri_c[None],
                                 0.0, INF)
        return jnp.min(t, axis=-1)
    timed(jax.jit(f_old), o, d, name="triangle_t stacked (current)")

    A, B, C = scene.tri_a, scene.tri_b, scene.tri_c

    def f_new(o, d):
        # unpacked woop: per-component, no stack/concat anywhere
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
        kz = jnp.where((adx > ady) & (adx > adz), 0,
                       jnp.where(ady > adz, 1, 2))
        # permuted ray dir
        def perm(x, y, z):
            px_ = jnp.where(kz == 0, y, jnp.where(kz == 1, z, x))
            py_ = jnp.where(kz == 0, z, jnp.where(kz == 1, x, y))
            pz_ = jnp.where(kz == 0, x, jnp.where(kz == 1, y, z))
            return px_, py_, pz_
        dpx, dpy, dpz = perm(dx, dy, dz)
        inv_z = 1.0 / dpz
        sx, sy, sz = -dpx * inv_z, -dpy * inv_z, inv_z
        kzb = kz[:, None]
        sxb, syb, szb = sx[:, None], sy[:, None], sz[:, None]

        def perm_b(x, y, z):
            px_ = jnp.where(kzb == 0, y, jnp.where(kzb == 1, z, x))
            py_ = jnp.where(kzb == 0, z, jnp.where(kzb == 1, x, y))
            pz_ = jnp.where(kzb == 0, x, jnp.where(kzb == 1, y, z))
            return px_, py_, pz_

        def shear_pt(v):
            rx = v[None, :, 0] - ox[:, None]
            ry = v[None, :, 1] - oy[:, None]
            rz = v[None, :, 2] - oz[:, None]
            px_, py_, pz_ = perm_b(rx, ry, rz)
            return px_ + sxb * pz_, py_ + syb * pz_, szb * pz_

        ax, ay, az = shear_pt(A)
        bx, by, bz = shear_pt(B)
        cx, cy, cz = shear_pt(C)
        e0 = bx * cy - by * cx
        e1 = cx * ay - cy * ax
        e2 = ax * by - ay * bx
        miss = ((jnp.minimum(jnp.minimum(e0, e1), e2) < 0.0)
                & (jnp.maximum(jnp.maximum(e0, e1), e2) > 0.0))
        det = e0 + e1 + e2
        ts = e0 * az + e1 * bz + e2 * cz
        ok = ~miss & (det != 0.0) & (jnp.sign(det) * ts > 0)
        t = jnp.where(ok, ts / jnp.where(det == 0.0, 1.0, det), INF)
        return jnp.min(t, axis=-1)
    timed(jax.jit(f_new), o, d, name="triangle_t unpacked")


if __name__ == "__main__":
    main()
