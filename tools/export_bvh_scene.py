"""Export the bench BVH scene (327k-tri blob in an empty Cornell box) as
a flat binary for tools/cpu_anchor_bvh.cpp:

  header: int32 n_tris, n_lights
  tris:   (n_tris, 9) f32  a.xyz b.xyz c.xyz
  emit:   (n_tris,) uint8  1 = light triangle
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def export(path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from lumo_tpu.scene import shapes
    from lumo_tpu.scene.cornell import empty_box
    from lumo_tpu.scene.instance import Mesh
    from lumo_tpu.scene.materials import LIGHT, Material

    sb = empty_box((0.95, 0.95, 0.95), Material.diffuse((0.9, 0.1, 0.1)),
                   Material.diffuse((0.1, 0.9, 0.1)))
    v, f, vn = shapes.blob(subdiv=7, seed=11, amp=0.22)
    mesh = Mesh(v, f, normals=vn)
    mat = Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0)
    (mesh.to_unit_size().to_origin().set_y(-0.799).translate(0.0, 0.0, -1.5)
     .add_to(sb, mat))
    scene = sb.build()
    a = np.asarray(scene.tri_a, np.float32)
    b = np.asarray(scene.tri_b, np.float32)
    c = np.asarray(scene.tri_c, np.float32)
    kind = np.asarray(scene.materials["kind"])
    emit = (kind[np.asarray(scene.tri_mat)] == LIGHT).astype(np.uint8)
    tris = np.concatenate([a, b, c], axis=1)
    with open(path, "wb") as fh:
        np.asarray([tris.shape[0], int(emit.sum())], np.int32).tofile(fh)
        tris.tofile(fh)
        emit.tofile(fh)
    print(f"wrote {path}: {tris.shape[0]} tris, {int(emit.sum())} light tris")


if __name__ == "__main__":
    export(sys.argv[1] if len(sys.argv) > 1 else "/tmp/blob_scene.bin")
