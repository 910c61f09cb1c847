"""Conference-room scene loaded from .obj/.mtl with two sphere lights
(counterpart of reference ``examples/conference.rs``).  The reference
streams conference.zip from the network; here the scene is loaded from
``./scenes/conference.obj`` (+ .mtl) when present, else a furniture-like
procedural stand-in room is built so the program always runs."""
from _common import example_args

args = example_args(default_spp=1, default_res=512)

import os

import numpy as np

from lumo_tpu.camera import build_camera
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder

if os.path.exists("scenes/conference.obj"):
    from lumo_tpu.io.obj import scene_from_file
    sb = scene_from_file("scenes/conference.obj",
                         mtl_source="scenes/conference.mtl"
                         if os.path.exists("scenes/conference.mtl") else None)
else:
    from lumo_tpu.scene import shapes
    from lumo_tpu.scene.instance import Mesh
    sb = SceneBuilder()
    white = Material.diffuse((0.73, 0.71, 0.68))
    wood = Material.diffuse((0.44, 0.28, 0.16))
    # room shell 1000x500x800
    gv, gf = shapes.grid_plane(n=1, size=1000.0, y=0.0)
    Mesh(gv, gf).translate(450.0, 0.0, 0.0).add_to(sb, white)
    Mesh(gv, gf).rotate_z(np.pi).translate(450.0, 500.0, 0.0).add_to(sb, white)
    # table + chairs as boxes
    table = np.diag([400.0, 10.0, 150.0, 1.0])
    table[:3, 3] = (450.0, 90.0, 150.0)
    sb.add_box(wood, transform=table)
    for dx in (-120.0, 0.0, 120.0):
        t = np.eye(4)
        t[:3, 3] = (450.0 + dx, 40.0, 150.0)
        t[0, 0] = t[1, 1] = t[2, 2] = 45.0
        sb.add_box(white, transform=t)

sb.add_sphere((-200.0, 40.0, -400.0), 10.0, Material.light(np.ones(4)))
sb.add_sphere((900.0, 300.0, -600.0), 10.0, Material.light(np.ones(4)))

camera = build_camera(origin=(-50.0, 400.0, -350.0),
                      towards=(500.0, 0.0, 250.0),
                      resolution=(args.res, args.res))
r = Renderer(sb.build(), camera).integrator("path").samples(args.spp)
img = r.render()
out = args.out or "conference.png"
r.save_png(img, out)
print(f"saved {out}")
