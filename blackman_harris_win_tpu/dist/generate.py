"""Communication-free sharded window generation.

The key property inherited from the reference: a window sample depends only on
its index, ``w[n] = sum_k ±a_k cos(2 pi k n / 2^PHI)`` with modular phase
(the per-instance counters of src/bh_win_7term.vhd:176-197 are closed-form
``(k*n) mod 2^PHI``).  Hence a 64M-point window shards over chips/hosts with
**zero communication** for generation — each shard computes its own phase
slice; no host ever materializes the full window (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import WindowSpec
from ..kernels.window import window_samples


def _taylor_fast_ok(coeffs_q, spec: WindowSpec, block: int) -> bool:
    """True when a consecutive ``block`` can route through the gather-free
    TAYLOR block kernel (kernels/taylor.py:taylor_window_range): HLS
    rounding, 2/3-term, and shard blocks aligned to the largest harmonic
    run R_1 = 2^(PW-LS-2)."""
    if spec.sin_type != "taylor" or spec.rounding != "hls":
        return False
    if len(coeffs_q) not in (2, 3) or spec.phase_width < 5:
        return False
    r1 = 1 << max(spec.phase_width - spec.lut_size - 2, 0)
    return block % r1 == 0


def sharded_window(coeffs_q, spec: WindowSpec, mesh: Mesh, axis: str = "blocks"):
    """Generate the full 2^phase_width window, sharded over ``axis``.

    Returns a global jax.Array sharded along its (single) sample axis: shard i
    holds samples [i*B, (i+1)*B).  No inter-device communication is emitted —
    each device evaluates its own closed-form phase slice.
    """
    nshards = mesh.shape[axis]
    if spec.n % nshards:
        raise ValueError(f"window length {spec.n} not divisible by {nshards} shards")
    block = spec.n // nshards
    coeffs_q = tuple(int(c) for c in coeffs_q)

    if _taylor_fast_ok(coeffs_q, spec, block):
        from ..kernels.taylor import taylor_window_range

        def shard_fn():
            i = jax.lax.axis_index(axis)
            return taylor_window_range(i * block, block, coeffs_q, spec)
    else:
        def shard_fn():
            i = jax.lax.axis_index(axis)
            n = i * block + jnp.arange(block, dtype=jnp.int32)
            return window_samples(n, coeffs_q, spec)

    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(),
            out_specs=P(axis),
        )
    )
    return fn()


def sharded_float_window(name_or_coeffs, pw: int, mesh: Mesh,
                         axis: str = "blocks"):
    """Full 2^pw float32 window (``kernels/floatwin.py``) sharded over
    ``axis`` — the same zero-communication phase-split as
    :func:`sharded_window`, for float consumers (Welch/STFT frames)."""
    from ..kernels.floatwin import DEFAULT_SPLIT, float_window_block

    nshards = mesh.shape[axis]
    n = 1 << pw
    if n % nshards:
        raise ValueError(f"window length {n} not divisible by {nshards} shards")
    block = n // nshards
    # pick the largest lo-split that still leaves >= 1 row per shard
    m = min(DEFAULT_SPLIT, block.bit_length() - 1)
    rows = block >> m

    def shard_fn():
        i = jax.lax.axis_index(axis)
        return float_window_block(i * block, rows, name_or_coeffs, pw, m=m)

    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(),
            out_specs=P(axis),
        )
    )
    return fn()


def sharded_comp_window(name_or_coeffs, pw: int, mesh: Mesh,
                        axis: str = "blocks"):
    """Full 2^pw compensated-f32 window (``kernels/compwin.py``) sharded
    over ``axis`` as an (hi, lo) pair — zero-communication phase-split
    generation holding the full −180 dB BH-7 floor for float consumers."""
    from ..kernels.compwin import comp_window_block
    from ..kernels.floatwin import DEFAULT_SPLIT

    nshards = mesh.shape[axis]
    n = 1 << pw
    if n % nshards:
        raise ValueError(f"window length {n} not divisible by {nshards} shards")
    block = n // nshards
    m = min(DEFAULT_SPLIT, block.bit_length() - 1)
    rows = block >> m

    def shard_fn():
        i = jax.lax.axis_index(axis)
        return comp_window_block(i * block, rows, name_or_coeffs, pw, m=m)

    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(),
            out_specs=(P(axis), P(axis)),
        )
    )
    return fn()


def sharded_window_range(coeffs_q, spec: WindowSpec, mesh: Mesh, n0: int,
                         count: int, axis: str = "blocks"):
    """Generate the consecutive sub-range [n0, n0+count) of a (possibly
    beyond-64M) window, sharded over ``axis`` — the streaming building
    block for window lengths whose *full* period should never materialize
    anywhere (2^26..2^30; the reference caps at 64M, README.md:2).  Shard i
    computes [n0 + i*B, n0 + (i+1)*B) closed-form; no communication."""
    nshards = mesh.shape[axis]
    if count % nshards:
        raise ValueError(f"count {count} not divisible by {nshards} shards")
    block = count // nshards
    coeffs_q = tuple(int(c) for c in coeffs_q)

    r1 = 1 << max(spec.phase_width - spec.lut_size - 2, 0)
    if _taylor_fast_ok(coeffs_q, spec, block) and n0 % r1 == 0:
        from ..kernels.taylor import taylor_window_range

        def shard_fn():
            i = jax.lax.axis_index(axis)
            return taylor_window_range(n0 + i * block, block, coeffs_q, spec)
    else:
        def shard_fn():
            i = jax.lax.axis_index(axis)
            n = n0 + i * block + jnp.arange(block, dtype=jnp.int32)
            return window_samples(n, coeffs_q, spec)

    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(),
            out_specs=P(axis),
        )
    )
    return fn()


def window_shard_fn(coeffs_q, spec: WindowSpec, axis: str, block: int):
    """The per-shard generator for use *inside* a larger shard_mapped step:
    returns this shard's [i*B, (i+1)*B) window block (no communication).
    TAYLOR/HLS configs route through the gather-free block kernel."""
    coeffs_q = tuple(int(c) for c in coeffs_q)

    if _taylor_fast_ok(coeffs_q, spec, block):
        from ..kernels.taylor import taylor_window_range

        def gen():
            i = jax.lax.axis_index(axis)
            return taylor_window_range(i * block, block, coeffs_q, spec)

        return gen

    def gen():
        i = jax.lax.axis_index(axis)
        n = i * block + jnp.arange(block, dtype=jnp.int32)
        return window_samples(n, coeffs_q, spec)

    return gen
