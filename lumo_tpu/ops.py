"""TPU-native building blocks for per-ray table lookups.

XLA on TPU lowers per-element gathers from small tables into full
index-space expansions — cost analysis shows ~1000x the useful traffic
for an (M, C)[idx (N,)] gather with small M.  The renderer's dispatch
tables (materials, light geometry, dense-path primitives) are all small,
so row selection is expressed as a one-hot matmul instead: it rides the
MXU, fuses with its consumers, and its VJP w.r.t. the (differentiable)
table is a transposed matmul rather than a scatter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# beyond this many rows a real gather wins (one-hot traffic ~ N*M)
ONEHOT_MAX_ROWS = 256


def onehot_rows(idx, n_rows, dtype=jnp.float32):
    """(N,) int ids → (N, n_rows) one-hot selector."""
    return jax.nn.one_hot(idx, n_rows, dtype=dtype)


def take_rows(table, idx, onehot=None):
    """table (M, C) or (M,) selected per ray: → (N, C) / (N,).

    Uses a one-hot matmul for small M (pass a precomputed ``onehot`` to
    share the selector across several tables), a plain gather otherwise.
    """
    table = jnp.asarray(table)
    M = table.shape[0]
    if M > ONEHOT_MAX_ROWS and onehot is None:
        return table[idx]
    if onehot is None:
        onehot = onehot_rows(idx, M, dtype=jnp.float32)
    squeeze = table.ndim == 1
    t2 = table[:, None] if squeeze else table
    out = onehot.astype(t2.dtype) @ t2.reshape(M, -1)
    out = out.reshape(onehot.shape[:-1] + t2.shape[1:])
    return out[..., 0] if squeeze else out


def take_rows_many(tables, idx):
    """Select the same rows from several float tables with ONE matmul.

    tables: list of (M,) or (M, C_i) float arrays → list of (N,) / (N, C_i).
    """
    M = tables[0].shape[0]
    # preserve the widest input dtype: an f32 hard-cast here silently
    # truncated f64 reference-mode geometry, breaking the error-bound
    # ray offsets (self-occluded shadow rays)
    dtype = jnp.result_type(*[jnp.asarray(t).dtype for t in tables])
    cols = [jnp.asarray(t).reshape(M, -1).astype(dtype)
            for t in tables]
    widths = [c.shape[1] for c in cols]
    packed = jnp.concatenate(cols, axis=1)              # (M, sum C_i)
    oh = onehot_rows(idx, M, dtype=dtype)
    out = oh @ packed                                    # (N, sum C_i)
    res = []
    off = 0
    for t, w in zip(tables, widths):
        piece = out[:, off:off + w]
        off += w
        res.append(piece[..., 0] if jnp.asarray(t).ndim == 1
                   else piece.reshape(idx.shape + jnp.asarray(t).shape[1:]))
    return res
