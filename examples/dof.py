"""Three marble-textured teapots on a checkerboard under an orthographic
thin-lens camera — depth of field (counterpart of reference
``examples/dof.rs``; teapot.zip download → stand-in blob when absent)."""
import math

from _common import example_args, load_mesh_or_blob

args = example_args(default_spp=512, default_res=512)

import numpy as np

from lumo_tpu.camera import ORTHOGRAPHIC, build_camera
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene import shapes
from lumo_tpu.scene.instance import Mesh
from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder

PI = math.pi

sb = SceneBuilder()

checker = sb.textures.checkerboard((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 100.0)
gv, gf = shapes.grid_plane(n=1, size=10.0, y=0.0)
Mesh(gv, gf).translate(0.0, -1.0, 0.0).add_to(
    sb, Material.diffuse((1.0, 1.0, 1.0), kd_tex=checker))

lv, lf = shapes.grid_plane(n=1, size=3.0, y=0.0)
Mesh(lv, lf).rotate_z(PI).translate(0.0, 8.0, -1.5).add_to(
    sb, Material.light(0.25 * np.ones(4), two_sided=True))

teapot = load_mesh_or_blob("teapot", subdiv=4, seed=5, amp=0.18).to_unit_size()
for i in range(3):
    marble = sb.textures.marble((1.0, 245 / 255.0, 1.0))
    (teapot.clone().to_origin().rotate_y(-PI / 4)
     .translate(0.0, -0.75, -1.0 * i)
     .add_to(sb, Material.diffuse((1.0, 1.0, 1.0), kd_tex=marble)))

o = np.array([-0.75, 0.25, 0.0])
t = np.array([0.0, -0.75, -1.0])
camera = build_camera(origin=tuple(o), towards=tuple(t),
                      lens_radius=0.03,
                      focal_length=float(np.linalg.norm(o - t)),
                      kind=ORTHOGRAPHIC, resolution=(args.res, args.res))
r = Renderer(sb.build(), camera).integrator("path").samples(args.spp)
img = r.render()
out = args.out or "dof.png"
r.save_png(img, out)
print(f"saved {out}")
