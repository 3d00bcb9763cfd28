"""Materialization barrier: a Pallas identity-copy kernel.

XLA's fusion heuristics can duplicate an arbitrarily expensive producer
into every overlapping read of its consumer (measured round 5: the DDC's
CORDIC mixer recomputed ~16x inside a strided conv's tap windows — 4.6x
end-to-end), and ``lax.optimization_barrier`` does NOT survive to the
optimized HLO on this toolchain (round-4 finding, kernels/compwin.py).
A custom call is the one thing XLA cannot fuse through: this kernel
copies its input tile-by-tile, forcing the producer to materialize
exactly once.  Cost: one HBM round trip of the array.

On non-TPU backends (CPU tests) it returns the input unchanged — the
semantics are identity either way; only the fusion boundary differs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_ROWS = 256
_TILE = _TILE_ROWS * 128


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def materialize(x):
    """Identity with a fusion barrier (TPU); plain identity elsewhere."""
    if jax.default_backend() != "tpu":
        return x
    flat = jnp.ravel(x)
    n = flat.shape[0]
    pad = (-n) % _TILE
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    rows = (n + pad) // 128
    grid = rows // _TILE_ROWS
    out = pl.pallas_call(
        _copy_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_TILE_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TILE_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), flat.dtype),
    )(flat.reshape(rows, 128))
    return out.reshape(-1)[:n].reshape(x.shape)
