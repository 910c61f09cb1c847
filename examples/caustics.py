"""Mirror and glass meshes in an empty box, BDPT caustics
(counterpart of reference ``examples/caustics.rs``; the reference
downloads suzanne.zip — stand-in blob when absent)."""
import math

from _common import example_args, load_mesh_or_blob

args = example_args(default_spp=2048, default_res=512)

from lumo_tpu.camera import build_camera
from lumo_tpu.color import uplift
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.cornell import empty_box
from lumo_tpu.scene.materials import Material

PI = math.pi
MAGENTA = uplift.from_srgb8(255, 0, 255).reshape(4)
CYAN = uplift.from_srgb8(0, 255, 255).reshape(4)

sb = empty_box(uplift.from_srgb8(242, 242, 242).reshape(4),
               Material.diffuse(MAGENTA), Material.diffuse(CYAN))

suzanne = load_mesh_or_blob("suzanne", subdiv=4, seed=7, amp=0.15).to_unit_size()

(suzanne.clone()
 .to_origin().rotate_y(-PI / 8).rotate_z(PI / 8).rotate_x(-PI / 8)
 .translate(0.5, -0.3, -1.0)
 .add_to(sb, Material.mirror()))

(suzanne.clone()
 .to_origin().rotate_y(PI / 8).rotate_z(-PI / 8).rotate_x(PI / 16)
 .translate(-0.35, 0.25, -1.25)
 .add_to(sb, Material.glass()))

camera = build_camera(origin=(0.0, 0.0, 2.0), zoom=3.0,
                      resolution=(args.res, args.res))
r = Renderer(sb.build(), camera).integrator("bdpt").samples(args.spp) \
    .bdpt_depth(12)  # long specular chains through the glass (VERDICT r1)
img = r.render()
out = args.out or "caustics.png"
r.save_png(img, out)
print(f"saved {out}")
