"""Image decoding (host-side): PNG via PIL, Radiance .hdr RGBE, normal /
bump maps.

Counterpart of reference ``src/image.rs``: PNG decode incl. palette /
grayscale / rgba (``image.rs:19-79``), sRGB transfer decode
(``rgb.rs:57-76``), RGBE decode (``rgb.rs:79-93``, ``image.rs:205-253``),
normal-map and bump decode (``image.rs:133-172``).
"""
from __future__ import annotations

import io as _io

import numpy as np


def _srgb_to_linear(u8: np.ndarray) -> np.ndarray:
    u = u8.astype(np.float64) / 255.0
    return np.where(u <= 0.04045, u / 12.92, ((u + 0.055) / 1.055) ** 2.4)


def load_png(source) -> np.ndarray:
    """PNG/JPEG → linear RGB (H, W, 3) float."""
    from PIL import Image
    img = Image.open(source if hasattr(source, "read") else source)
    img = img.convert("RGB")
    return _srgb_to_linear(np.asarray(img))


def load_normal_map(source) -> np.ndarray:
    """Tangent-space normal map: rgb ∈ [0,1] → 2·rgb − 1, normalized
    (reference ``image.rs:133-150``)."""
    from PIL import Image
    img = Image.open(source if hasattr(source, "read") else source).convert("RGB")
    n = np.asarray(img).astype(np.float64) / 255.0 * 2.0 - 1.0
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n


def bump_to_normal_map(source, strength: float = 1.0) -> np.ndarray:
    """Grayscale height map → tangent-space normals via central differences
    (reference ``image.rs:152-172``)."""
    from PIL import Image
    img = Image.open(source if hasattr(source, "read") else source).convert("L")
    h = np.asarray(img).astype(np.float64) / 255.0
    gy, gx = np.gradient(h)
    n = np.stack([-gx * strength, gy * strength, np.ones_like(h)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return n


def load_hdr(source) -> np.ndarray:
    """Radiance .hdr (RGBE) → linear RGB (H, W, 3) float
    (reference ``image.rs:205-253`` + ``rgb.rs:79-93``)."""
    data = source.read() if hasattr(source, "read") else open(source, "rb").read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("not a Radiance HDR file")
    # header ends at blank line; then the resolution line
    pos = data.find(b"\n\n")
    if pos < 0:
        raise ValueError("bad HDR header")
    pos += 2
    eol = data.find(b"\n", pos)
    res = data[pos:eol].split()
    if res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation {res!r}")
    h, w = int(res[1]), int(res[3])
    buf = np.frombuffer(data, np.uint8, offset=eol + 1)

    rows = np.zeros((h, w, 4), np.uint8)
    p = 0
    for y in range(h):
        # new-style RLE scanline: 0x02 0x02 hi lo
        if buf[p] == 2 and buf[p + 1] == 2 and ((int(buf[p + 2]) << 8) | int(buf[p + 3])) == w:
            p += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = int(buf[p])
                    p += 1
                    if count > 128:   # run
                        rows[y, x:x + count - 128, c] = buf[p]
                        p += 1
                        x += count - 128
                    else:             # literal
                        rows[y, x:x + count, c] = buf[p:p + count]
                        p += count
                        x += count
        else:  # flat scanline
            n = w * 4
            rows[y] = buf[p:p + n].reshape(w, 4)
            p += n
    mant = rows[..., :3].astype(np.float64)
    exp = rows[..., 3].astype(np.int32)
    scale = np.ldexp(1.0, exp - 128 - 8)
    rgb = mant * scale[..., None]
    rgb[exp == 0] = 0.0
    return rgb
