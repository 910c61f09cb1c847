"""Rough-transparent dragon in an empty box (counterpart of reference
``examples/dragon.rs``; dragon.zip download → stand-in blob when absent)."""
import math

from _common import example_args, load_mesh_or_blob

args = example_args(default_spp=512, default_res=512)

from lumo_tpu.camera import build_camera
from lumo_tpu.color import uplift
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.cornell import empty_box
from lumo_tpu.scene.materials import Material

PI = math.pi

sb = empty_box(uplift.from_srgb8(242, 242, 242).reshape(4),
               Material.diffuse(uplift.from_srgb8(255, 0, 0).reshape(4)),
               Material.diffuse(uplift.from_srgb8(0, 255, 0).reshape(4)))

dragon = load_mesh_or_blob("dragon", subdiv=5, seed=13, amp=0.25)
MAGENTA = uplift.from_srgb8(255, 0, 255).reshape(4)
(dragon.to_unit_size().to_origin().rotate_y(5.0 * PI / 8.0)
 .scale_uniform(1.3).set_y(-0.799).translate(0.0, 0.0, -1.4)
 .add_to(sb, Material.transparent(MAGENTA, 0.03, 1.5)))

camera = build_camera(resolution=(args.res, args.res))
r = Renderer(sb.build(), camera).integrator("path").samples(args.spp)
img = r.render()
out = args.out or "dragon.png"
r.save_png(img, out)
print(f"saved {out}")
