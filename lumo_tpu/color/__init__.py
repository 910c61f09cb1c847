from lumo_tpu.color import dense, space, uplift, wavelength  # noqa: F401
