"""Round-5 packet-kernel experiments on the 327k-tri blob scene.

Measures, on the real chip:
- closest/any-hit throughput for coherent (primary) and bounce-class
  (surface-origin cosine-hemisphere) ray sets;
- per-packet visited interior/leaf counters (divergence evidence);
- lblk sweep (256/512/1024): leaf-DMA count vs per-leaf VPU work;
- sub sweep (8/4/2): stack sharing vs scalar-loop iterations;
- wrapper overhead: full closest_hit vs the pre-packed kernel alone.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import os
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from lumo_tpu.accel import build as accel_build, pallas_bvh
from lumo_tpu.camera import build_camera
from lumo_tpu.scene import shapes

N = 65536


def timed(fn, *args, n=4, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best * 1e3:9.2f} ms  {N / best / 1e6:8.3f} Mrays/s",
          flush=True)
    return best


def packs(lblks=(128, 256, 512)):
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    a = np.asarray(v[f[:, 0]], np.float32)
    b = np.asarray(v[f[:, 1]], np.float32)
    c = np.asarray(v[f[:, 2]], np.float32)
    # same placement as the bench scene
    for arr in (a, b, c):
        pass
    lo, hi = accel_build.triangle_bounds(a, b, c)
    bvh = accel_build.build(lo, hi)
    p = bvh.order
    a, b, c = a[p], b[p], c[p]
    vn = None
    nd = {"lo": bvh.node_lo, "hi": bvh.node_hi, "right": bvh.node_right,
          "first": bvh.node_first, "count": bvh.node_count,
          "axis": bvh.node_axis}
    out = {}
    for lb in lblks:
        blk = pallas_bvh.pack_blocks(nd, a, b, c, lblk=lb)
        if blk["lblk"] != lb:
            continue
        out[lb] = pallas_bvh.to_device(blk)
        print(f"lblk={lb}: wide nodes={len(blk['ax0'])} "
              f"nblk={blk['tri_blk'].shape[0]} depth={blk['depth']} "
              f"MB={blk['tri_blk'].nbytes / 1e6:.0f}", flush=True)
    return out, (a, b, c)


def ray_sets(abc):
    a, b, c = abc
    camera = build_camera(resolution=(256, 256))
    pix = jnp.arange(N, dtype=jnp.uint32)
    px = (pix % 256).astype(jnp.float32)
    py = (pix // 256).astype(jnp.float32)
    # aim camera at the blob's AABB
    lo = a.min(axis=0)
    hi = a.max(axis=0)
    ctr = (lo + hi) / 2
    cam = build_camera(origin=tuple(ctr + np.array([0, 0, 2.5 * (hi - lo).max()])),
                       towards=tuple(ctr), resolution=(256, 256))
    o_pri, d_pri = cam.generate_ray(jnp.stack([px, py], -1) + 0.5,
                                    jnp.full((N, 2), 0.5))
    # bounce-class: origins on random triangle surface points, cosine
    # hemisphere directions about the (unnormalized) geometric normal
    rng = np.random.default_rng(0)
    ti = rng.integers(0, len(a), N)
    u = rng.random((N, 2)).astype(np.float32)
    su = np.sqrt(u[:, 0:1])
    ba = (1 - su)
    bb = su * (1 - u[:, 1:2])
    bc = su * u[:, 1:2]
    p = ba * a[ti] + bb * b[ti] + bc * c[ti]
    ng = np.cross(b[ti] - a[ti], c[ti] - a[ti])
    ng /= np.maximum(np.linalg.norm(ng, axis=1, keepdims=True), 1e-20)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = np.sum(d * ng, axis=1, keepdims=True) < 0
    d = np.where(flip, -d, d)
    o = p + 1e-4 * ng
    return (o_pri, d_pri), (jnp.asarray(o), jnp.asarray(d))


def main():
    blks, abc = packs()
    (o_pri, d_pri), (o_bnc, d_bnc) = ray_sets(abc)

    for lb, blk in blks.items():
        ch = jax.jit(lambda o, d, blk=blk: pallas_bvh.closest_hit(blk, o, d))
        ah = jax.jit(lambda o, d, blk=blk: pallas_bvh.any_hit(
            blk, o, d, t_max=0.05))
        timed(ch, o_pri, d_pri, name=f"closest primary lblk={lb}")
        timed(ch, o_bnc, d_bnc, name=f"closest bounce  lblk={lb}")
        timed(ah, o_bnc, d_bnc, name=f"anyhit  bounce  lblk={lb}")

    # per-packet counters on each pack: interior visits, leaf DMAs,
    # leaf-row tests — the row tests are the (128, lblk) Woop sweeps
    for lb, blk in blks.items():
        st_fn = jax.jit(lambda o, d, blk=blk: pallas_bvh.closest_hit_stats(
            blk, o, d))
        for name, o, d in (("primary", o_pri, d_pri),
                           ("bounce", o_bnc, d_bnc)):
            t, p, st = st_fn(o, d)
            jax.block_until_ready(st)
            st = np.asarray(st)
            live = st.sum(axis=1) > 0
            print(f"lblk={lb} {name:8s} packets={st.shape[0]} "
                  f"int mean={st[live, 0].mean():.0f} max={st[:, 0].max()} "
                  f"leaf mean={st[live, 1].mean():.0f} max={st[:, 1].max()} "
                  f"rows mean={st[live, 2].mean():.0f} max={st[:, 2].max()} "
                  f"(live {live.sum()})", flush=True)
    blk = blks[min(blks)]

    # wrapper overhead: pre-packed kernel alone vs full call
    scalars, packed, packed_t, n, perm, interp = pallas_bvh._prep(
        blk, o_bnc, d_bnc, 1e30, None, 8)
    run = jax.jit(lambda pk, pt: pallas_bvh._run(
        scalars, blk["tri_blk"], pk, pt, any_hit=False, lblk=blk["lblk"],
        interpret=interp))
    timed(run, packed, packed_t, name="kernel only (pre-packed, bounce)")


if __name__ == "__main__":
    main()
