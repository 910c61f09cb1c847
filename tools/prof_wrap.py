"""Wrapper cost decomposition for trace._closest at 262k lanes:
argsort, pack/scatter, Pallas call, differentiable t-recompute gather."""
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

from lumo_tpu.accel import pallas_bvh
from lumo_tpu.geometry import intersect as geo
from lumo_tpu.scene import shapes, trace
from lumo_tpu.scene.cornell import empty_box
from lumo_tpu.scene.instance import Mesh
from lumo_tpu.scene.materials import Material
from lumo_tpu.camera import build_camera
from lumo_tpu.config import INF

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
    print(f"{name:46s} {best * 1e3:9.2f} ms (real {(best - 0.025) * 1e3:8.2f})",
          flush=True)
    return best


def main():
    sb = empty_box((0.95, 0.95, 0.95),
                   Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    Mesh(v, f, normals=vn).to_unit_size().to_origin().set_y(-0.799) \
        .translate(0.0, 0.0, -1.5).add_to(
            sb, Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0))
    scene = sb.build()
    camera = build_camera(resolution=(256, 256))
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 65536, N).astype(np.uint32)
    raster = jnp.asarray(np.stack([(pix % 256), (pix // 256)], -1)
                         .astype(np.float32) + 0.5)
    o, d = camera.generate_ray(raster, jnp.full((N, 2), 0.5))
    t1, p1 = jax.jit(lambda o, d: trace._closest(scene, o, d, 1e30))(o, d)
    hitp = jnp.clip(o + t1[:, None] * d, -3, 3)
    dd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    ob = hitp + 1e-4 * dd

    blk = scene.bvh_blk
    tm = jnp.full((N,), 1e30, jnp.float32)

    timed(jax.jit(lambda o, d: pallas_bvh.closest_hit(blk, o, d)),
          ob, dd, name="pallas closest_hit (full wrapper)")

    sc, pk, pkt, n, perm, interp = pallas_bvh._prep(blk, ob, dd, tm, None, 8)
    timed(jax.jit(lambda pk, pkt: pallas_bvh._run(
        sc, blk["tri_blk"], pk, pkt, any_hit=False, lblk=blk["lblk"])),
        pk, pkt, name="pallas _run (kernel only)")

    timed(jax.jit(lambda o, d, tm: pallas_bvh._sort_perm(blk, o, d, tm)),
          ob, dd, tm, name="_sort_perm (morton + argsort)")
    key = jnp.arange(N, dtype=jnp.uint32)[::-1]
    timed(jax.jit(jnp.argsort), key, name="bare argsort 262k u32")

    timed(jax.jit(lambda o, d, tm, perm: pallas_bvh._pad_pack_rays(
        o, d, tm, perm, 8)), ob, dd, tm, perm, name="_pad_pack_rays")

    # differentiable t recompute (the gather + Woop retest in _closest)
    p_safe = jnp.clip(p1, 0, scene.n_tris - 1)

    @jax.jit
    def recompute(o, d, p_safe):
        abc = jnp.concatenate([scene.tri_a, scene.tri_b, scene.tri_c],
                              axis=1)[p_safe]
        a, b, c = abc[:, 0:3], abc[:, 3:6], abc[:, 6:9]
        kz, shear = geo.ray_setup(d)
        t_re, _, _ = geo.triangle_t(o, kz, shear, a[:, None], b[:, None],
                                    c[:, None], 0.0, INF)
        return t_re[:, 0]

    timed(recompute, ob, dd, p_safe, name="diff t recompute (gather+woop)")

    @jax.jit
    def gather_only(p_safe):
        return jnp.concatenate([scene.tri_a, scene.tri_b, scene.tri_c],
                               axis=1)[p_safe]

    timed(gather_only, p_safe, name="  gather only (262k x 9)")





def stats_main():
    """Packet counters on the bench-scene bounce mix."""
    sb = empty_box((0.95, 0.95, 0.95),
                   Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    Mesh(v, f, normals=vn).to_unit_size().to_origin().set_y(-0.799) \
        .translate(0.0, 0.0, -1.5).add_to(
            sb, Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0))
    scene = sb.build()
    camera = build_camera(resolution=(256, 256))
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 65536, N).astype(np.uint32)
    raster = jnp.asarray(np.stack([(pix % 256), (pix // 256)], -1)
                         .astype(np.float32) + 0.5)
    o, d = camera.generate_ray(raster, jnp.full((N, 2), 0.5))
    t1, p1 = jax.jit(lambda o, d: trace._closest(scene, o, d, 1e30))(o, d)
    hitp = jnp.clip(o + t1[:, None] * d, -3, 3)
    dd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    ob = hitp + 1e-4 * dd
    blk = scene.bvh_blk
    t, pm, st = jax.jit(lambda o, d: pallas_bvh.closest_hit_stats(
        blk, o, d))(ob, dd)
    jax.block_until_ready(st)
    st = np.asarray(st)
    live = st.sum(axis=1) > 0
    print(f"bench-mix stats: packets={st.shape[0]} live={live.sum()} "
          f"int mean={st[live, 0].mean():.0f} max={st[:, 0].max()} "
          f"leaf mean={st[live, 1].mean():.0f} max={st[:, 1].max()} "
          f"rows mean={st[live, 2].mean():.0f} max={st[:, 2].max()}",
          flush=True)
    # how many rays sit on walls vs blob?
    on_blob = np.asarray(p1) < scene.n_tris - 22
    print(f"hit prim < blob threshold: {on_blob.mean():.2f}")



def sub_main():
    """sub (packet width) sweep on the bench-scene bounce mix."""
    sb = empty_box((0.95, 0.95, 0.95),
                   Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    Mesh(v, f, normals=vn).to_unit_size().to_origin().set_y(-0.799) \
        .translate(0.0, 0.0, -1.5).add_to(
            sb, Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0))
    scene = sb.build()
    camera = build_camera(resolution=(256, 256))
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 65536, N).astype(np.uint32)
    raster = jnp.asarray(np.stack([(pix % 256), (pix // 256)], -1)
                         .astype(np.float32) + 0.5)
    o, d = camera.generate_ray(raster, jnp.full((N, 2), 0.5))
    t1, p1 = jax.jit(lambda o, d: trace._closest(scene, o, d, 1e30))(o, d)
    hitp = jnp.clip(o + t1[:, None] * d, -3, 3)
    dd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    ob = hitp + 1e-4 * dd
    blk = scene.bvh_blk
    for sub in (8, 16, 32):
        try:
            fn = jax.jit(lambda o, d, sub=sub: pallas_bvh.closest_hit(
                blk, o, d, sub=sub))
            timed(fn, ob, dd, name=f"closest bench-mix sub={sub}")
            st_fn = jax.jit(lambda o, d, sub=sub: pallas_bvh.closest_hit_stats(
                blk, o, d, sub=sub))
            t, pm, st = st_fn(ob, dd)
            jax.block_until_ready(st)
            st = np.asarray(st)
            live = st.sum(axis=1) > 0
            print(f"  sub={sub}: packets={st.shape[0]} "
                  f"int {st[live, 0].mean():.0f} leaf {st[live, 1].mean():.0f} "
                  f"rows {st[live, 2].mean():.0f}", flush=True)
            fa = jax.jit(lambda o, d, sub=sub: pallas_bvh.any_hit(
                blk, o, d, t_max=2.0, sub=sub))
            timed(fa, ob, dd, name=f"anyhit  bench-mix sub={sub}")
        except Exception as e:  # noqa: BLE001
            print(f"sub={sub} failed: {type(e).__name__}: {e}"[:240],
                  flush=True)


def fit_main():
    """Regress per-packet time = a*int + b*leaf + c*rows + d by sweeping
    t_max on the bench-mix rays (varies pruning, hence the counters)."""
    sb = empty_box((0.95, 0.95, 0.95),
                   Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    Mesh(v, f, normals=vn).to_unit_size().to_origin().set_y(-0.799) \
        .translate(0.0, 0.0, -1.5).add_to(
            sb, Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0))
    scene = sb.build()
    camera = build_camera(resolution=(256, 256))
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 65536, N).astype(np.uint32)
    raster = jnp.asarray(np.stack([(pix % 256), (pix // 256)], -1)
                         .astype(np.float32) + 0.5)
    o, d = camera.generate_ray(raster, jnp.full((N, 2), 0.5))
    t1, p1 = jax.jit(lambda o, d: trace._closest(scene, o, d, 1e30))(o, d)
    hitp = jnp.clip(o + t1[:, None] * d, -3, 3)
    dd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    dd = dd / jnp.linalg.norm(dd, axis=1, keepdims=True)
    ob = hitp + 1e-4 * dd
    blk = scene.bvh_blk
    rows = []
    for tmx in (0.02, 0.1, 0.3, 1.0, 1e30):
        tm = jnp.full((N,), tmx, jnp.float32)
        fn = jax.jit(lambda o, d, tm: pallas_bvh.closest_hit(
            blk, o, d, t_max=tm, seed=False))
        tt = timed(fn, ob, dd, tm, name=f"closest t_max={tmx}") - 0.025
        st_fn = jax.jit(lambda o, d, tm: pallas_bvh.closest_hit_stats(
            blk, o, d, t_max=tm))
        _, _, st = st_fn(ob, dd, tm)
        st = np.asarray(st)
        NPK = st.shape[0]
        rows.append((tt * 1e6 / NPK, st[:, 0].mean(), st[:, 1].mean(),
                     st[:, 2].mean()))
        print(f"   us/packet {rows[-1][0]:.0f} int {rows[-1][1]:.0f} "
              f"leaf {rows[-1][2]:.0f} rows {rows[-1][3]:.0f}", flush=True)
    A = np.array([[r[1], r[2], r[3], 1.0] for r in rows])
    y = np.array([r[0] for r in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    print(f"fit us: per-int {coef[0]:.3f} per-leaf {coef[1]:.3f} "
          f"per-row {coef[2]:.3f} fixed {coef[3]:.1f}", flush=True)


if __name__ == "__main__":
    import sys as _sys
    if "--stats" in _sys.argv:
        stats_main()
    elif "--sub" in _sys.argv:
        sub_main()
    elif "--fit" in _sys.argv:
        fit_main()
    else:
        main()
