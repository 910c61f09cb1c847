"""N-scaling and sort-key experiments on the 327k-tri blob.

If cost/ray falls with N (denser Morton clusters -> fewer rows/leaf),
the stream renderer should simply run more lanes.  Sort variants test
octant-major vs morton-major keys and cell resolution.
"""
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

from lumo_tpu.accel import build as accel_build, pallas_bvh
from lumo_tpu.scene import shapes


def timed(fn, *args, n=4, name="", rays=1):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    real = best - 0.0250
    print(f"{name:46s} {best * 1e3:9.2f} ms  {rays / best / 1e6:7.3f} "
          f"(floor-corr {rays / real / 1e6:7.3f}) Mrays/s", flush=True)
    return best


def bounce_rays(a, b, c, N, seed=0):
    rng = np.random.default_rng(seed)
    ti = rng.integers(0, len(a), N)
    u = rng.random((N, 2)).astype(np.float32)
    su = np.sqrt(u[:, 0:1])
    p = ((1 - su) * a[ti] + su * (1 - u[:, 1:2]) * b[ti]
         + su * u[:, 1:2] * c[ti])
    ng = np.cross(b[ti] - a[ti], c[ti] - a[ti])
    ng /= np.maximum(np.linalg.norm(ng, axis=1, keepdims=True), 1e-20)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = np.sum(d * ng, axis=1, keepdims=True) < 0
    d = np.where(flip, -d, d)
    return jnp.asarray(p + 1e-4 * ng), jnp.asarray(d)


def main():
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    a = np.asarray(v[f[:, 0]], np.float32)
    b = np.asarray(v[f[:, 1]], np.float32)
    c = np.asarray(v[f[:, 2]], np.float32)
    lo, hi = accel_build.triangle_bounds(a, b, c)
    bvh = accel_build.build(lo, hi)
    p = bvh.order
    a, b, c = a[p], b[p], c[p]
    nd = {"lo": bvh.node_lo, "hi": bvh.node_hi, "right": bvh.node_right,
          "first": bvh.node_first, "count": bvh.node_count,
          "axis": bvh.node_axis}
    blk = pallas_bvh.to_device(pallas_bvh.pack_blocks(nd, a, b, c, lblk=256))

    ch = jax.jit(lambda o, d: pallas_bvh.closest_hit(blk, o, d))
    for N in (65536, 131072, 262144, 524288):
        o, d = bounce_rays(a, b, c, N)
        timed(ch, o, d, name=f"bounce N={N}", rays=N)

    # per-packet stats at 65k vs 524k (does density cut rows/leaf?)
    st_fn = jax.jit(lambda o, d: pallas_bvh.closest_hit_stats(blk, o, d))
    for N in (65536, 524288):
        o, d = bounce_rays(a, b, c, N)
        t, pm, st = st_fn(o, d)
        jax.block_until_ready(st)
        st = np.asarray(st)
        live = st.sum(axis=1) > 0
        print(f"stats N={N}: int mean={st[live, 0].mean():.0f} "
              f"leaf mean={st[live, 1].mean():.0f} "
              f"rows mean={st[live, 2].mean():.0f}", flush=True)


if __name__ == "__main__":
    main()
