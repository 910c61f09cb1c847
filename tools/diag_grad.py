"""Diagnose the f32-vs-f64 theta-gradient gap (VERDICT r4 task 3).

Per-pixel dL/dtheta via forward-mode jvp (theta is scalar) in f32 and
f64: reports (a) the cancellation ratio sum|g_i| / |sum g_i| — if >>1 the
net gradient is a small difference of large terms and f32 relative error
on the net is amplified by that ratio; (b) whether the f32 error is
spread (accumulation rounding) or concentrated in a few rays (discrete /
ill-conditioned lanes).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import jax.numpy as jnp
import numpy as np


def per_pixel_tangent(dtype, res, spp, scale_key="kd"):
    from lumo_tpu import film as film_mod
    from lumo_tpu.camera import cornell_camera
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import path_trace
    from lumo_tpu.sampling.samplers import _randfloat
    from lumo_tpu.scene.cornell import cornell_box

    scene = cornell_box().build(dtype=dtype)
    cam = cornell_camera(resolution=(res, res), dtype=dtype)
    n = res * res
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % res).astype(dtype)
    py = (pix // res).astype(dtype)
    wbm = jnp.asarray(film_mod.wb_matrix("DCI-P3", "CORNELL"), dtype)

    @jax.jit
    def one_spp_rgb(theta, sp):
        mats = dict(scene.materials)
        mats[scale_key] = mats[scale_key].astype(dtype) * theta
        sc = dataclasses.replace(scene, materials=mats)
        jx = _randfloat(pix, sp ^ jnp.uint32(0x51633E2D)).astype(dtype)
        jy = _randfloat(pix, sp ^ jnp.uint32(0x68BC21EB)).astype(dtype)
        raster = jnp.stack([px + jx, py + jy], -1)
        o, d = cam.generate_ray(raster, jnp.full((n, 2), 0.5, dtype))
        lam_u = _randfloat(pix, sp ^ jnp.uint32(0x02E5BE93)).astype(dtype)
        lam = wavelength.sample(lam_u)
        rk = (pix * jnp.uint32(2654435761)) ^ sp
        r, lam_out, _ = path_trace.integrate(sc, o, d, lam, ray_key=rk,
                                             fixed_depth=2)
        return film_mod.spectral_to_rgb(r, lam_out, wbm)

    rgb = jnp.zeros((n, 3), dtype)
    tan = jnp.zeros((n, 3), dtype)
    for s in range(spp):
        sp = jnp.uint32((0x9E3779B9 * (s + 1)) & 0xFFFFFFFF)
        r, t = jax.jvp(lambda th: one_spp_rgb(th, sp),
                       (jnp.asarray(1.0, dtype),), (jnp.asarray(1.0, dtype),))
        rgb = rgb + r
        tan = tan + t
    rgb, tan = rgb / spp, tan / spp
    # dL/dtheta per pixel for L = mean(rgb^2): 2*rgb*tan / n (pre-mask)
    g_pix = 2.0 * np.asarray(rgb, np.float64) * np.asarray(tan, np.float64)
    return g_pix.sum(axis=1), np.asarray(rgb, np.float64)


def main(res=64, spp=4):
    g32, rgb32 = per_pixel_tangent(np.float32, res, spp)
    from lumo_tpu import config
    config.use_f64(True)
    try:
        g64, rgb64 = per_pixel_tangent(np.float64, res, spp)
    finally:
        config.use_f64(False)
    stable = np.abs(rgb32 - rgb64).max(axis=1) < 0.5
    n = g64.size
    g32m = np.where(stable, g32, 0.0) / n
    g64m = np.where(stable, g64, 0.0) / n
    net64, gross64 = g64m.sum(), np.abs(g64m).sum()
    net32 = g32m.sum()
    err = g32m - g64m
    order = np.argsort(-np.abs(err))
    print(f"net64={net64:.6e} gross64={gross64:.6e} "
          f"cancellation={gross64 / abs(net64):.1f}x")
    print(f"net32={net32:.6e} rel_err_net={abs(net32 - net64) / abs(net64):.4f}")
    print(f"rel_err_gross={abs(net32 - net64) / gross64:.2e}")
    print(f"sum|err|={np.abs(err).sum():.3e}  "
          f"top10 |err| share={np.abs(err[order[:10]]).sum() / np.abs(err).sum():.3f}")
    top = order[:10]
    for i in top:
        print(f"  pix {i:5d}: g64={g64m[i]:+.3e} g32={g32m[i]:+.3e} "
              f"err={err[i]:+.3e} rgb64={rgb64[i]}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
