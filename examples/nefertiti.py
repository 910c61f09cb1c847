"""Textured bust between mirror-ish disks lit by a quad light
(counterpart of reference ``examples/nefertiti.rs``; the scan download →
stand-in blob with a marble texture when absent)."""
import math

from _common import example_args, load_mesh_or_blob

args = example_args(default_spp=512, default_res=512)

import numpy as np

from lumo_tpu.camera import build_camera
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.instance import Mesh
from lumo_tpu.scene.materials import Material
from lumo_tpu.scene.scene import SceneBuilder

PI = math.pi
sb = SceneBuilder()
r = 10.0
black = Material.diffuse((0.0, 0.0, 0.0))

# analytic disks, as in the reference (``nefertiti.rs:12-60``)
sb.add_disk((0.0, -1.0, 0.0), (0.0, 1.0, 0.0), r, black)    # floor
sb.add_disk((0.0, 1.0, 0.0), (0.0, -1.0, 0.0), r, black)    # roof
sb.add_disk((1.0, 0.0, 0.0), (-1.0, 0.0, 0.0), r, black)    # right wall

# quad area light overhead
sb.add_rectangle([-0.4, 0.99, -1.4], [-0.4, 0.99, -0.6], [0.4, 0.99, -0.6],
                 Material.light(1.5 * np.ones(4)))

bust = load_mesh_or_blob("nefertiti", subdiv=5, seed=21, amp=0.18)
marble = sb.textures.marble((0.9, 0.85, 0.8))
(bust.to_unit_size().to_origin().rotate_x(-PI / 2).rotate_y(PI)
 .set_y(-0.99).translate(0.0, 0.0, -1.0)
 .add_to(sb, Material.diffuse((1.0, 1.0, 1.0), kd_tex=marble)))

camera = build_camera(origin=(0.1, 0.2, 0.3), towards=(0.0, 0.1, -1.0),
                      resolution=(args.res, args.res))
ren = Renderer(sb.build(), camera).integrator("path").samples(args.spp)
img = ren.render()
out = args.out or "nefertiti.png"
ren.save_png(img, out)
print(f"saved {out}")
