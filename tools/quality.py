"""Quality harness: f64 CPU reference allclose + FD pixel gradients.

BASELINE's quality metric ("pixel-grad max-err vs CPU reference") and
VERDICT r2 task 4.  The reference renders in f64 (``lib.rs:55``); the TPU
production path is f32.  This harness renders the SAME code twice on the
CPU backend — float64 (the reference run) and float32 — with bit-identical
sample streams (the counter RNG emits float32 in both modes, so every
light pick / jitter / wavelength decision matches) and reports:

- per-spectral-bin radiance error f32 vs f64 (max / p99.9 / mean): pure
  accumulated-arithmetic error, plus the rare silhouette ray where the
  f32 closest-hit picks a different primitive;
- pixel-gradient error: d(loss)/d(theta) for a scalar scaling one
  material's reflectance table, f32 reverse-mode AD vs f64 central
  finite differences.

Run directly (``python tools/quality.py [res spp]``) for one JSON line;
``bench.py --sub quality`` embeds it in the driver bench; the pytest
wrapper runs a tiny configuration in a subprocess (x64 is process-global).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import jax.numpy as jnp
import numpy as np


def _render(dtype, res, spp, theta, scale_key, grad_mode=False, mask=None,
            want_prims=False):
    """Cornell res²@spp; returns (radiance (N,4), loss[, prims]).

    ``grad_mode=False``: direct-light (BASELINE config 1, matches the
    reference's while-style recursion — forward only).  ``grad_mode=True``:
    the differentiable fixed-depth path tracer (the production fwd+bwd
    path, same as bench.py).  ``want_prims`` (grad_mode only) returns the
    (spp, depth, N) per-bounce hit-prim ids — the discrete path topology."""
    from lumo_tpu import film as film_mod
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import direct_light, path_trace
    from lumo_tpu.sampling.samplers import _randfloat
    from lumo_tpu.camera import cornell_camera
    from lumo_tpu.scene.cornell import cornell_box

    scene = cornell_box().build(dtype=dtype)
    cam = cornell_camera(resolution=(res, res), dtype=dtype)
    n = res * res
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % res).astype(dtype)
    py = (pix // res).astype(dtype)
    wbm = jnp.asarray(film_mod.wb_matrix("DCI-P3", "CORNELL"), dtype)

    @jax.jit
    def one_spp(theta, sp):
        mats = dict(scene.materials)
        mats[scale_key] = mats[scale_key].astype(dtype) * theta
        sc = dataclasses.replace(scene, materials=mats)
        # all stochastic inputs derive from the f32 counter hash →
        # bit-identical streams in both dtypes
        jx = _randfloat(pix, sp ^ jnp.uint32(0x51633E2D)).astype(dtype)
        jy = _randfloat(pix, sp ^ jnp.uint32(0x68BC21EB)).astype(dtype)
        raster = jnp.stack([px + jx, py + jy], -1)
        o, d = cam.generate_ray(raster, jnp.full((n, 2), 0.5, dtype))
        lam_u = _randfloat(pix, sp ^ jnp.uint32(0x02E5BE93)).astype(dtype)
        lam = wavelength.sample(lam_u)
        rk = (pix * jnp.uint32(2654435761)) ^ sp
        if grad_mode:
            out = path_trace.integrate(sc, o, d, lam, ray_key=rk,
                                       fixed_depth=2,
                                       trace_prims=want_prims)
            r, lam_out = out[0], out[1]
            prims = out[3] if want_prims else None
        else:
            r, lam_out, _ = direct_light.integrate(sc, o, d, lam,
                                                   ray_key=rk)
            prims = None
        return r, film_mod.spectral_to_rgb(r, lam_out, wbm), prims

    theta = jnp.asarray(theta, dtype)
    rad = jnp.zeros((n, 4), dtype)
    rgb = jnp.zeros((n, 3), dtype)
    prim_seq = []
    for s in range(spp):
        r, g, pr = one_spp(theta, jnp.uint32((0x9E3779B9 * (s + 1))
                                             & 0xFFFFFFFF))
        rad = rad + r
        rgb = rgb + g
        if want_prims:
            prim_seq.append(np.asarray(pr))
    rad = rad / spp
    rgb = rgb / spp
    if mask is not None:
        rgb = rgb * jnp.asarray(mask, dtype)[:, None]
    loss = jnp.mean(rgb ** 2)
    if want_prims:
        return rad, loss, np.stack(prim_seq)
    return rad, loss


def run(res=64, spp=4, fd_h=1e-3):
    from lumo_tpu import config

    # the scaled material: the diffuse reflectance table ('kd'), so the
    # FD-vs-AD probe exercises the BSDF gradient path (not just the more
    # linear emission scaling)
    scale_key = "kd"

    rad32, _ = _render(np.float32, res, spp, 1.0, scale_key)
    config.use_f64(True)
    try:
        rad64, _ = _render(np.float64, res, spp, 1.0, scale_key)
    finally:
        config.use_f64(False)

    err = np.abs(np.asarray(rad32, np.float64) - np.asarray(rad64))
    # discrete flips: silhouette rays whose f32 closest hit picks a
    # different (coplanar/tied) primitive than f64 — e.g. the Cornell
    # light quad lies exactly in the ceiling plane (cornell_box.rs:51-54).
    # They differ by O(emission), not by arithmetic error, and are
    # reported as a count; continuous error stats exclude them.
    stable = err.max(axis=1) < 0.5
    err_s = err[stable]
    denom = np.abs(np.asarray(rad64))[stable] + 1e-3
    rel = err_s / denom

    # Discrete path-topology flips (diagnosed r5, tools/diag_grad.py):
    # rays whose f32 SECONDARY bounce hits a different primitive than
    # f64 (micro-differences in the sampled direction crossing a
    # geometry edge) carry O(1) gradient differences — the second-order
    # analog of the radiance 'flipped_rays' above, structural rather
    # than arithmetic.  The gradient comparison masks them out the same
    # way; their count is reported as grad_flipped_rays.
    _, _, pr32 = _render(np.float32, res, spp, 1.0, scale_key, True,
                         want_prims=True)
    config.use_f64(True)
    try:
        _, _, pr64 = _render(np.float64, res, spp, 1.0, scale_key, True,
                             want_prims=True)
    finally:
        config.use_f64(False)
    topo = (pr32 == pr64).all(axis=(0, 1))
    stable_g = stable & topo

    config.use_f64(True)
    try:
        # FD pixel gradient in f64 (the reference-quality derivative).
        # 5-point central stencil: the kd-scaled loss is cubic-ish in
        # theta, so the O(h²) 2-point stencil's truncation (~1e-5 rel)
        # would dominate the AD-vs-FD comparison.
        def f64_loss(th):
            return float(_render(np.float64, res, spp, th, scale_key,
                                 True, stable_g)[1])
        lp1 = f64_loss(1.0 + fd_h)
        lm1 = f64_loss(1.0 - fd_h)
        lp2 = f64_loss(1.0 + 2 * fd_h)
        lm2 = f64_loss(1.0 - 2 * fd_h)
        g_fd = (8.0 * (lp1 - lm1) - (lp2 - lm2)) / (12.0 * fd_h)
        # f64 AD gradient of the SAME estimator: isolates AD correctness
        g64 = float(jax.grad(
            lambda th: _render(np.float64, res, spp, th, scale_key,
                               True, stable_g)[1])(jnp.float64(1.0)))
    finally:
        config.use_f64(False)

    # f32 AD gradient (the production path)
    g32 = float(jax.grad(
        lambda th: _render(np.float32, res, spp, th, scale_key, True,
                           stable_g)[1])(jnp.float32(1.0)))

    return {
        "res": res, "spp": spp, "scale_key": str(scale_key),
        "flipped_rays": int((~stable).sum()), "rays": int(stable.size),
        "grad_flipped_rays": int((stable & ~topo).sum()),
        "bin_abs_err_max": float(err_s.max()),
        "bin_abs_err_mean": float(err_s.mean()),
        "bin_rel_err_p999": float(np.quantile(rel, 0.999)),
        "bin_rel_err_mean": float(rel.mean()),
        "pixel_grad_ad_f32": g32,
        "pixel_grad_ad_f64": g64,
        "pixel_grad_fd_f64": g_fd,
        # AD vs FD on the identical f64 estimator: correctness of the
        # reverse-mode machinery
        "grad_ad_vs_fd_rel_err": abs(g64 - g_fd) / (abs(g_fd) + 1e-12),
        # f32 AD vs f64 AD on structurally-stable rays: the production
        # precision gap
        "grad_f32_vs_ref_rel_err": abs(g32 - g64) / (abs(g64) + 1e-12),
    }


def _bvh_scene(dtype):
    """Accelerated + instanced + textured test scene: two runtime
    instances of a ~20k-tri blob in an empty Cornell box over a
    checkerboard floor — the code paths where f32 robustness is actually
    at risk (VERDICT r3 weak #8: the Cornell harness never exercises
    BVH traversal, instance transforms, or textures)."""
    from lumo_tpu.scene import shapes
    from lumo_tpu.scene.cornell import empty_box
    from lumo_tpu.scene.instance import Mesh, rotate_y, scale, translation
    from lumo_tpu.scene.materials import Material

    sb = empty_box((0.95, 0.95, 0.95),
                   Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    checker = sb.textures.checkerboard((0.1, 0.1, 0.1), (0.9, 0.9, 0.9),
                                       8.0)
    sb.add_rectangle((-0.99, -0.795, -1.99), (0.99, -0.795, -1.99),
                     (-0.99, -0.795, -0.01),
                     Material.diffuse((1.0, 1.0, 1.0), kd_tex=checker))
    v, f, vn = shapes.blob(subdiv=5, seed=11, amp=0.22)
    mesh = Mesh(v, f, normals=vn)
    mesh.to_unit_size().to_origin()
    mats = [Material.diffuse((0.8, 0.6, 0.2)),
            Material.diffuse((0.2, 0.5, 0.8))]
    ts = [translation(-0.45, -0.45, -1.5) @ rotate_y(0.7) @ scale(0.6, 0.6, 0.6),
          translation(0.45, -0.5, -1.2) @ scale(0.5, 0.5, 0.5)]
    mesh.add_instances_to(sb, ts, mats)
    return sb.build(dtype=dtype)


def _render_bvh(dtype, res, spp, theta=1.0, mask=None):
    """Returns (radiance (N,4), loss).  ``theta`` scales the 'kd' table,
    so d(loss)/d(theta) probes the material-gradient path THROUGH the
    (opaque, stop-gradded) BVH/instance traversal + the differentiable
    local-frame t recompute."""
    from lumo_tpu.camera import build_camera
    from lumo_tpu.color import wavelength
    from lumo_tpu.integrators import path_trace
    from lumo_tpu.sampling.samplers import _randfloat

    scene = _bvh_scene(dtype)
    cam = build_camera(resolution=(res, res), dtype=dtype)
    n = res * res
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % res).astype(dtype)
    py = (pix // res).astype(dtype)

    @jax.jit
    def one_spp(theta, sp):
        mats = dict(scene.materials)
        mats["kd"] = mats["kd"].astype(dtype) * theta
        sc = dataclasses.replace(scene, materials=mats)
        jx = _randfloat(pix, sp ^ jnp.uint32(0x51633E2D)).astype(dtype)
        jy = _randfloat(pix, sp ^ jnp.uint32(0x68BC21EB)).astype(dtype)
        o, d = cam.generate_ray(jnp.stack([px + jx, py + jy], -1),
                                jnp.full((n, 2), 0.5, dtype))
        lam_u = _randfloat(pix, sp ^ jnp.uint32(0x02E5BE93)).astype(dtype)
        lam = wavelength.sample(lam_u)
        rk = (pix * jnp.uint32(2654435761)) ^ sp
        r, lam_out, _ = path_trace.integrate(sc, o, d, lam, ray_key=rk,
                                             fixed_depth=3)
        return r

    theta = jnp.asarray(theta, dtype)
    rad = jnp.zeros((n, 4), dtype)
    for s in range(spp):
        rad = rad + one_spp(theta,
                            jnp.uint32((0x9E3779B9 * (s + 1)) & 0xFFFFFFFF))
    rad = rad / spp
    lrad = rad * jnp.asarray(mask, dtype)[:, None] if mask is not None else rad
    return rad, jnp.mean(lrad ** 2)


def run_bvh(res=32, spp=2, fd_h=1e-3):
    """f32-vs-f64 allclose + material-gradient probe on the
    accelerated/instanced/textured scene (VERDICT r4 task 5: the driver
    artifact carried no robustness evidence for the accelerated path)."""
    from lumo_tpu import config

    rad32, _ = _render_bvh(np.float32, res, spp)
    config.use_f64(True)
    try:
        rad64, _ = _render_bvh(np.float64, res, spp)
    finally:
        config.use_f64(False)
    err = np.abs(np.asarray(rad32, np.float64) - np.asarray(rad64))
    stable = err.max(axis=1) < 0.5
    err_s = err[stable]
    denom = np.abs(np.asarray(rad64))[stable] + 1e-3
    rel = err_s / denom

    # gradient probe through the instanced/accelerated path
    g32 = float(jax.grad(
        lambda th: _render_bvh(np.float32, res, spp, th, stable)[1])(
        jnp.float32(1.0)))
    config.use_f64(True)
    try:
        g64 = float(jax.grad(
            lambda th: _render_bvh(np.float64, res, spp, th, stable)[1])(
            jnp.float64(1.0)))

        def f64_loss(th):
            return float(_render_bvh(np.float64, res, spp, th, stable)[1])
        g_fd = (8.0 * (f64_loss(1.0 + fd_h) - f64_loss(1.0 - fd_h))
                - (f64_loss(1.0 + 2 * fd_h) - f64_loss(1.0 - 2 * fd_h))) \
            / (12.0 * fd_h)
    finally:
        config.use_f64(False)
    return {
        "res": res, "spp": spp,
        "flipped_rays": int((~stable).sum()), "rays": int(stable.size),
        "bin_abs_err_max": float(err_s.max()),
        "bin_abs_err_mean": float(err_s.mean()),
        "bin_rel_err_p999": float(np.quantile(rel, 0.999)),
        "bin_rel_err_mean": float(rel.mean()),
        "pixel_grad_ad_f32": g32,
        "pixel_grad_ad_f64": g64,
        "pixel_grad_fd_f64": g_fd,
        "grad_ad_vs_fd_rel_err": abs(g64 - g_fd) / (abs(g_fd) + 1e-12),
        "grad_f32_vs_ref_rel_err": abs(g32 - g64) / (abs(g64) + 1e-12),
    }


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    out = run(res, spp)
    out["bvh"] = run_bvh()
    print(json.dumps(out))
