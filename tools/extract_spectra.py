"""Extract public spectral measurement data tables into ``spectra.npz``.

The CIE 1931 color matching functions, standard illuminants (A, D50, D65,
F2, F7, and the Cornell-box light spectrum) and material IOR spectra
(diamond/glass/silver) are published physical measurement data.  The
reference renderer (ekarpp/lumo, ``src/tracer/color/samples.rs``) embeds the
same data as const arrays sampled every 5nm over [360, 830] nm (95 samples).

This one-shot script parses those numeric tables out of the reference file
and stores them as a compressed numpy archive consumed by
``lumo_tpu.color.dense``.  Data, not code.

Usage: python tools/extract_spectra.py [path-to-samples.rs]
"""
import sys

import numpy as np

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src/tracer/color/samples.rs"
OUT = "lumo_tpu/color/data/spectra.npz"

text = open(SRC).read()

# Tables appear as `<name>,` followed by a bracketed list of floats.
tables = {}
i = 0
while True:
    lb = text.find("[", i)
    if lb < 0:
        break
    rb = text.find("]", lb)
    if rb < 0:
        break
    # the identifier immediately preceding the '[' (skipping ',' and space)
    head = text[:lb].rstrip()
    if head.endswith(","):
        head = head[:-1].rstrip()
    name = head.split()[-1].strip(",") if head else ""
    body = text[lb + 1:rb].replace("\n", " ")
    try:
        vals = np.array([float(v) for v in body.split(",") if v.strip()], dtype=np.float64)
    except ValueError:
        vals = None
    if vals is not None and vals.shape == (95,) and name.isidentifier():
        tables[name] = vals
    i = rb + 1

expected = {
    "diamond_eta", "glass_eta", "mirror_eta", "mirror_k",
    "A", "D50", "D65", "F2", "F7", "CORNELL", "X", "Y", "Z",
}
missing = expected - set(tables)
assert not missing, f"missing tables: {missing} (got {sorted(tables)})"

np.savez_compressed(OUT, **{k: tables[k] for k in sorted(tables)})
print(f"wrote {OUT}: {sorted(tables)}")
