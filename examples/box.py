"""Mirror + glass spheres in an empty box, BDPT with a wide Gaussian
filter (counterpart of reference ``examples/box.rs``)."""
from _common import example_args

args = example_args(default_spp=64, default_res=512)

from lumo_tpu.camera import build_camera
from lumo_tpu.color import uplift
from lumo_tpu.film import PixelFilter
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.cornell import empty_box
from lumo_tpu.scene.materials import Material

MAGENTA = uplift.from_srgb8(255, 0, 255).reshape(4)
CYAN = uplift.from_srgb8(0, 255, 255).reshape(4)

sb = empty_box(uplift.from_srgb8(242, 242, 242).reshape(4),
               Material.diffuse(MAGENTA), Material.diffuse(CYAN))
sb.add_sphere((-0.45, -0.5, -1.5), 0.25, Material.mirror())
sb.add_sphere((0.45, -0.5, -1.3), 0.25, Material.glass())

camera = build_camera(resolution=(args.res, args.res))
r = (Renderer(sb.build(), camera)
     .integrator("bdpt")
     .samples(args.spp)
     .pixel_filter(PixelFilter.gaussian(2.5, 2.5 / 4.0)))
img = r.render()
out = args.out or "box.png"
r.save_png(img, out)
print(f"saved {out}")
