"""Throughput of the Pallas packet-traversal kernel: coherent primary
rays vs incoherent bounce-class rays, closest vs any-hit."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu.accel import pallas_bvh
from lumo_tpu.camera import build_camera
from lumo_tpu.scene import shapes
from lumo_tpu.scene.cornell import empty_box
from lumo_tpu.scene.instance import Mesh
from lumo_tpu.scene.materials import Material

N = 65536


def timed(fn, *args, n=6, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt * 1e3:9.2f} ms  {N / dt / 1e6:8.3f} Mrays/s",
          flush=True)
    return dt


def main():
    sb = empty_box((0.95, 0.95, 0.95), Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    mesh = Mesh(v, f, normals=vn)
    mat = Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0)
    (mesh.to_unit_size().to_origin().set_y(-0.799).translate(0.0, 0.0, -1.5)
     .add_to(sb, mat))
    scene = sb.build()
    blk = scene.bvh_blk
    print("tris", scene.n_tris, "nodes", blk["right"].shape[0],
          "lblk", blk["lblk"], "depth", blk["depth"],
          "blocks", blk["tri_blk"].shape[0], flush=True)

    camera = build_camera(resolution=(256, 256))
    pix = jnp.arange(N, dtype=jnp.uint32)
    px = (pix % 256).astype(jnp.float32)
    py = (pix // 256).astype(jnp.float32)
    o_pri, d_pri = camera.generate_ray(jnp.stack([px, py], -1) + 0.5,
                                       jnp.full((N, 2), 0.5))

    key = jax.random.PRNGKey(0)
    # incoherent: random origins inside the box, random directions
    o_inc = jax.random.uniform(key, (N, 3)) * jnp.asarray([550., 550., 550.]) \
        - jnp.asarray([0., 0., 1650.0])
    d_inc = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    ch = jax.jit(lambda o, d: pallas_bvh.closest_hit(blk, o, d))
    ah = jax.jit(lambda o, d: pallas_bvh.any_hit(blk, o, d, t_max=500.0))

    timed(ch, o_pri, d_pri, name="closest primary (coherent)")
    timed(ch, o_inc, d_inc, name="closest random (incoherent)")
    timed(ah, o_pri, d_pri, name="any-hit primary")
    timed(ah, o_inc, d_inc, name="any-hit random")


if __name__ == "__main__":
    main()
