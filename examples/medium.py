"""Cornell box filled with a homogeneous scattering medium
(counterpart of reference ``examples/medium.rs``)."""
from _common import example_args

args = example_args(default_spp=512, default_res=512)

from lumo_tpu.camera import cornell_camera
from lumo_tpu.renderer import Renderer
from lumo_tpu.scene.cornell import cornell_box

sb = cornell_box()
sb.set_medium((0.5, 0.5, 0.5), (0.1, 0.1, 0.1), 0.9)

camera = cornell_camera(resolution=(args.res, args.res))
r = (Renderer(sb.build(), camera)
     .integrator("path")
     .samples(args.spp)
     .illuminant("CORNELL"))
img = r.render()
out = args.out or "cornell_medium.png"
r.save_png(img, out)
print(f"saved {out}")
