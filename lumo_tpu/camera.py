"""Cameras: perspective + orthographic with thin-lens DoF and full
bidirectional support (importance sampling, pdfs, inverse raster lookup).

Counterpart of reference ``src/tracer/camera*``: matrices are baked
host-side in float64 numpy (projection, look-at, screen→raster per
``camera/matrices.rs``), ray generation and the bidirectional pdfs are
batched JAX ops over raster-coordinate wavefronts.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from lumo_tpu.geometry.onb import dot, normalize
from lumo_tpu.sampling import maps

PERSPECTIVE = 0
ORTHOGRAPHIC = 1

_TINY = 1e-30


def _perspective_matrix(vfov_deg: float) -> np.ndarray:
    near, far = 1e-2, 1e3
    a = far / (far - near)
    b = -far * near / (far - near)
    proj = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, a, b], [0, 0, 1, 0]],
                    dtype=np.float64)
    ti = 1.0 / np.tan(np.radians(vfov_deg) / 2.0)
    scale = np.diag([ti, ti, 1.0, 1.0])
    return scale @ proj


def _orthographic_matrix() -> np.ndarray:
    # scale z to [0,1] over (near=0, far=1) (reference ``matrices.rs:15-20``)
    return np.diag([1.0, 1.0, 1.0, 1.0])


def _world_to_camera(origin, towards, up) -> np.ndarray:
    origin = np.asarray(origin, np.float64)
    forward = np.asarray(towards, np.float64) - origin
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    up2 = np.cross(right, forward)
    m = np.eye(4)
    m[0, :3], m[1, :3], m[2, :3] = right, up2, forward
    m[:3, 3] = -(m[:3, :3] @ origin)
    return m


def _screen_to_raster(resolution, zoom) -> np.ndarray:
    w, h = resolution
    aspect = w / h
    if aspect > 1.0:
        smin = np.array([-aspect, -1.0])
        smax = np.array([aspect, 1.0])
    else:
        smin = np.array([-1.0, -1.0 / aspect])
        smax = np.array([1.0, 1.0 / aspect])
    d = smax - smin
    m = np.diag([float(w), -float(h), 1.0, 1.0])
    m = m @ np.diag([1.0 / d[0], 1.0 / d[1], 1.0, 1.0])
    t = np.eye(4)
    t[0, 3], t[1, 3] = -smin[0], -smax[1]
    m = m @ t
    return m @ np.diag([zoom, zoom, zoom, 1.0])


def _project(m, p):
    """Apply 4x4 to (..., 3) points with projective division (numpy)."""
    q = p @ m[:3, :3].T + m[:3, 3]
    w = p @ m[3, :3].T + m[3, 3]
    return q / w[..., None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    r2c: Any            # (4, 4) raster → camera (with projective divide)
    c2r: Any            # (4, 4) camera → raster
    c2w_rot: Any        # (3, 3) camera → world rotation
    c2w_t: Any          # (3,) camera origin in world
    lens_radius: Any
    focal_length: Any
    image_plane_area: Any
    kind: int = dataclasses.field(metadata=dict(static=True))
    resolution: tuple = dataclasses.field(metadata=dict(static=True))

    # ------------------------------------------------------------------
    def _apply4(self, m, p):
        q = p @ m[:3, :3].T + m[:3, 3]
        w = p @ m[3, :3].T + m[3, 3]
        return q / jnp.where(w == 0.0, 1.0, w)[..., None]

    def to_world_dir(self, v):
        return v @ self.c2w_rot.T

    def to_local_dir(self, v):
        return v @ self.c2w_rot

    def to_world_pt(self, p):
        return p @ self.c2w_rot.T + self.c2w_t

    def to_local_pt(self, p):
        return (p - self.c2w_t) @ self.c2w_rot

    def generate_ray(self, raster_xy, u_dof):
        """raster (N, 2) + lens uniforms (N, 2) → (o, d) world rays
        (reference ``camera.rs:221-268``)."""
        N = raster_xy.shape[0]
        p_raster = jnp.concatenate([raster_xy, jnp.zeros((N, 1), raster_xy.dtype)], -1)
        p_cam = self._apply4(self.r2c, p_raster)
        if self.kind == PERSPECTIVE:
            xo_local = jnp.zeros((N, 3), raster_xy.dtype)
            wi_local = normalize(p_cam)
        else:
            xo_local = p_cam
            wi_local = jnp.zeros((N, 3), raster_xy.dtype).at[..., 2].set(1.0)
        # thin-lens depth of field (reference ``add_dof``, ``camera.rs:221-243``)
        lens_xy = self.lens_radius * maps.square_to_disk(u_dof)
        lens = jnp.concatenate([lens_xy, jnp.zeros((N, 1), raster_xy.dtype)], -1)
        focus_dist = self.focal_length / jnp.maximum(wi_local[..., 2:3], _TINY)
        use_dof = self.lens_radius > 0.0
        xo_dof = xo_local + lens
        wi_dof = focus_dist * wi_local - lens
        xo_local = jnp.where(use_dof, xo_dof, xo_local)
        wi_local = jnp.where(use_dof, wi_dof, wi_local)
        o = self.to_world_pt(xo_local)
        d = normalize(self.to_world_dir(wi_local))
        return o, d

    # ---- bidirectional support (reference ``camera.rs:271-388``) ----

    def raster_xy(self, o, d):
        """Inverse lookup: ray → raster coords + validity
        (reference ``camera.rs:174-213``)."""
        w, h = self.resolution
        if self.kind == ORTHOGRAPHIC:
            xo_local = self.to_local_pt(o)
            r = self._apply4(self.c2r, xo_local)[..., :2]
        else:
            wi_local = self.to_local_dir(d)
            cos = wi_local[..., 2]
            fl = jnp.where(self.lens_radius == 0.0, 1.0, self.focal_length) \
                / jnp.maximum(cos, _TINY)
            xo_local = self.to_local_pt(o)
            focus = xo_local + wi_local * fl[..., None]
            r = self._apply4(self.c2r, focus)[..., :2]
            r = jnp.where(cos[..., None] > 0.0, r, -jnp.ones_like(r))
        ok = ((r[..., 0] >= 0.0) & (r[..., 0] < w)
              & (r[..., 1] >= 0.0) & (r[..., 1] < h))
        return r, ok

    def lens_area(self):
        return jnp.where(self.lens_radius == 0.0, 1.0,
                         jnp.pi * self.lens_radius ** 2)

    def sample_towards(self, xi, u):
        """Sample a lens point and a ray toward world point xi
        (reference ``camera.rs:271-295``).  Returns (o, d, ok)."""
        N = xi.shape[0]
        lens_xy = self.lens_radius * maps.square_to_disk(u)
        lens = jnp.concatenate([lens_xy, jnp.zeros((N, 1), xi.dtype)], -1)
        if self.kind == ORTHOGRAPHIC:
            xi_local = self.to_local_pt(xi)
            xo_local = xi_local * jnp.asarray([1.0, 1.0, 0.0], xi.dtype)
            o = self.to_world_pt(xo_local + lens)
            d = normalize(xi - o)
        else:
            xi_local = self.to_local_pt(xi)
            wi_local = normalize(xi_local - lens)
            o = self.to_world_pt(lens)
            d = normalize(self.to_world_dir(wi_local))
        _, ok = self.raster_xy(o, d)
        return o, d, ok

    def pdf_importance(self, o, d, xi):
        """PDF for importance arriving at xi w.r.t. solid angle
        (reference ``camera.rs:343-366``)."""
        _, ok = self.raster_xy(o, d)
        ng = self.to_world_dir(jnp.asarray([0.0, 0.0, 1.0], o.dtype))
        dist2 = jnp.sum((xi - o) ** 2, axis=-1)
        pdf = dist2 / jnp.maximum(jnp.abs(dot(ng, d)) * self.lens_area(), _TINY)
        return jnp.where(ok, jnp.maximum(pdf, 0.0), 0.0)

    def sample_importance(self, o, d):
        """Incident importance W_e for a lens ray (reference
        ``camera.rs:369-388``).  Returns (importance (N,), raster (N,2), ok)."""
        r, ok = self.raster_xy(o, d)
        if self.kind == ORTHOGRAPHIC:
            imp = jnp.full(o.shape[:-1], 1.0 / self.image_plane_area)
        else:
            wi_local = self.to_local_dir(d)
            cos = jnp.maximum(wi_local[..., 2], _TINY)
            imp = 1.0 / (self.image_plane_area * cos ** 4 * self.lens_area())
        return jnp.where(ok, imp, 0.0), r, ok

    def pdf_xo(self, o):
        """PDF of the lens-point (area measure), reference ``camera.rs:298-321``."""
        if self.kind == ORTHOGRAPHIC:
            return jnp.full(o.shape[:-1], 1.0 / self.image_plane_area)
        xo_local = self.to_local_pt(o)
        r2 = (self.lens_radius + 1e-6) ** 2
        on_lens = jnp.sum(xo_local ** 2, axis=-1) < r2
        return jnp.where(on_lens, 1.0 / self.lens_area(), 0.0)

    def pdf_wi(self, o, d):
        """Directional pdf w.r.t. solid angle (reference ``camera.rs:324-341``)."""
        _, ok = self.raster_xy(o, d)
        wi_local = self.to_local_dir(d)
        cos = wi_local[..., 2]
        if self.kind == ORTHOGRAPHIC:
            return jnp.where(1.0 - cos < 1e-6, 1.0, 0.0)
        pdf = 1.0 / jnp.maximum(self.image_plane_area * cos ** 3, _TINY)
        return jnp.where(ok & (cos > 0.0), pdf, 0.0)


def build_camera(origin=(0.0, 0.0, 0.0), towards=(0.0, 0.0, -1.0),
                 up=(0.0, 1.0, 0.0), zoom=1.0, lens_radius=0.0,
                 focal_length=0.0, resolution=(1024, 768), vfov=90.0,
                 kind=PERSPECTIVE, dtype=np.float32) -> Camera:
    """Fluent-equivalent of the reference ``CameraBuilder`` defaults
    (``camera/builder.rs:33-56``)."""
    c2s = _perspective_matrix(vfov) if kind == PERSPECTIVE else _orthographic_matrix()
    w2c = _world_to_camera(origin, towards, up)
    s2r = _screen_to_raster(resolution, zoom)
    c2r = s2r @ c2s
    r2c = np.linalg.inv(c2r)
    c2w = np.linalg.inv(w2c)

    # image plane area in camera space (reference ``camera.rs:56-77``)
    w, h = resolution
    p_min = _project(np.linalg.inv(c2s), _project(np.linalg.inv(s2r),
                                                  np.array([[0.0, 0.0, 0.0]])))[0]
    p_max = _project(np.linalg.inv(c2s), _project(np.linalg.inv(s2r),
                                                  np.array([[float(w), float(h), 0.0]])))[0]
    p_min2 = p_min[:2] / (p_min[2] if p_min[2] != 0.0 else 1.0)
    p_max2 = p_max[:2] / (p_max[2] if p_max[2] != 0.0 else 1.0)
    delta = p_max2 - p_min2
    area = abs(delta[0] * delta[1])

    jf = lambda x: jnp.asarray(np.asarray(x), dtype)
    return Camera(
        r2c=jf(r2c), c2r=jf(c2r),
        c2w_rot=jf(c2w[:3, :3]), c2w_t=jf(c2w[:3, 3]),
        lens_radius=jf(lens_radius), focal_length=jf(focal_length),
        image_plane_area=jf(area),
        kind=kind, resolution=(int(w), int(h)),
    )


def cornell_camera(resolution=(512, 512), dtype=np.float32) -> Camera:
    """The ported Cornell-box camera (reference ``camera.rs:139-148``)."""
    return build_camera(origin=(278.0, 273.0, -800.0),
                        towards=(278.0, 273.0, 0.0),
                        zoom=2.8, focal_length=0.035,
                        resolution=resolution, dtype=dtype)
