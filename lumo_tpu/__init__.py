"""lumo_tpu: a TPU-native differentiable spectral path tracer.

A from-scratch JAX/Pallas re-design of the capabilities of ekarpp/lumo
(CPU/Rust reference): wavefront path tracing, bidirectional path tracing
and direct-light integration; hero-wavelength spectral transport;
microfacet BSDFs with reflection and transmission; SAH BVHs; .obj/.mtl
scene ingestion — designed for XLA compilation and device-mesh scaling
rather than per-ray recursion.
"""
__version__ = "0.1.0"
