"""Metal bunny in an empty Cornell box, path traced over a BVH
(counterpart of reference examples/bunny.rs).

The reference downloads bunny.zip at runtime; this image has no network
egress, so a procedurally displaced icosphere (~20k tris, same triangle-
count class) stands in unless ``./scenes/bunny.obj`` exists.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax

p = argparse.ArgumentParser()
p.add_argument("--spp", type=int, default=256)
p.add_argument("--res", type=int, default=512)
p.add_argument("--cpu", action="store_true")
p.add_argument("--subdiv", type=int, default=5)
p.add_argument("--out", default="bunny.png")
args = p.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from lumo_tpu.camera import build_camera
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene import shapes
from lumo_tpu.scene.cornell import empty_box
from lumo_tpu.scene.instance import Mesh
from lumo_tpu.scene.materials import Material

sb = empty_box((0.95, 0.95, 0.95),
               Material.diffuse((0.9, 0.1, 0.1)),
               Material.diffuse((0.1, 0.9, 0.1)))

if os.path.exists("scenes/bunny.obj"):
    from lumo_tpu.io import obj as obj_io
    verts, normals, uvs, groups = obj_io.parse_obj(obj_io._read("scenes/bunny.obj"))
    fv = groups[0][1]
    mesh = Mesh(verts, fv, normals=normals if groups[0][2] is not None else None,
                normal_idx=groups[0][2])
else:
    v, f, vn = shapes.blob(subdiv=args.subdiv, seed=11, amp=0.22)
    mesh = Mesh(v, f, normals=vn)

bunny = Material.metal((0.9, 0.7, 0.1), 0.1, 2.5, 3.0)
(mesh.to_unit_size().to_origin().set_y(-0.799).translate(0.0, 0.0, -1.5)
 .add_to(sb, bunny))

scene = sb.build()
print(f"scene: {scene.n_tris} tris, BVH "
      f"{'on (' + str(len(scene.bvh['count'])) + ' nodes)' if scene.bvh else 'off'}")
camera = build_camera(resolution=(args.res, args.res))
r = Renderer(scene, camera).samples(args.spp)
img = r.render()
r.save_png(img, args.out)
print(f"saved {args.out}")
