"""Tone-map API normalization + debug radiance sanitizer painting."""
import jax.numpy as jnp
import numpy as np
import pytest

from lumo_tpu import film as film_mod


def test_tone_map_kind_names():
    assert film_mod.tone_map_kind("reinhard") == film_mod.REINHARD
    assert film_mod.tone_map_kind("Clamp") == film_mod.CLAMP
    assert film_mod.tone_map_kind("nomap") == film_mod.NOMAP
    assert film_mod.tone_map_kind(film_mod.REINHARD) == film_mod.REINHARD
    with pytest.raises((KeyError, ValueError)):
        film_mod.tone_map_kind("bogus")
    with pytest.raises(ValueError):
        film_mod.tone_map_kind(7)


def test_reinhard_by_name_matches_constant():
    lam = jnp.full((4, 4), 550.0)
    c = jnp.abs(jnp.sin(jnp.arange(16.0))).reshape(4, 4) * 3.0
    by_name = film_mod.tone_map("reinhard", c, lam)
    by_kind = film_mod.tone_map(film_mod.REINHARD, c, lam)
    np.testing.assert_allclose(np.asarray(by_name), np.asarray(by_kind))


def test_debug_sanitizer_paints():
    lam = jnp.full((4, 4), 550.0)  # mid-green wavelength
    c = jnp.ones((4, 4))
    c = c.at[0, 0].set(jnp.nan)                    # NaN lane → green paint
    c = c.at[1, 1].set(-1.0)                       # negative → red paint
    c = c.at[2, 2].set(2e3)                        # huge → blue paint
    out = np.asarray(film_mod.tone_map(film_mod.NOMAP, c, lam, debug=True))
    assert np.all(np.isfinite(out))
    # clean lane untouched; green paint at a 550nm hero sample glows at
    # ~32x; red/blue paint carry little energy at 550nm but the painted
    # lanes must still differ from the clean value
    assert out[3].max() == 1.0
    assert out[0].max() > 10.0
    assert not np.allclose(out[1], 1.0)
    assert not np.allclose(out[2], 1.0)
    # without debug, NaNs flow through untouched
    out2 = np.asarray(film_mod.tone_map(film_mod.NOMAP, c, lam))
    assert np.isnan(out2[0, 0])
