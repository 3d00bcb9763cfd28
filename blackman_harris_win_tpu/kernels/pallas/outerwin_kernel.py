"""Fused outer-product window generation + in-kernel reduction.

Round-2 VERDICT item 3: the scan+checksum bench harness ceilings at
~19 Gsamp/s because XLA materializes each 4-8M-sample block in HBM before
reducing (BENCH_NOTES.md probe E) — so the outer-product generator
(``kernels/outerwin.py``) could only be measured against that wall.  This
kernel removes the wall: the checksum reduction happens *inside* the Pallas
kernel — each grid step generates one (rows x 2^m) tile in VMEM/vregs and
emits a single int32 partial sum to SMEM, so the window itself never
touches HBM.  Per-step HBM traffic is just the (rows, K-1) slice of the
h-tables (~KBs) plus 4 output bytes: the measurement is pure generation
compute.

The tile math is byte-identical to ``outerwin.window_block_outer``'s inner
loop (shared helper ``tile_window``), so the in-kernel checksum equals the
jnp path's scan checksum bit-for-bit (int32 addition is associative mod
2^32) — the in-bench golden gate.

The deployment story is unchanged (windows are *consumed* in-fusion, config
7 style); this kernel exists to bound the generator itself and as the
pattern for fused consumers that want the window delivered in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import WindowSpec
from ..outerwin import _tables
from . import limb


def tile_window(ch_blk, sh_blk, cl_t, sl_t, a0: int, guard: int,
                spec: WindowSpec):
    """One (rows, 2^m) window tile from table slices — the exact
    ``window_block_outer`` accumulate (one fused round-half-up
    ``mulsub_shift30`` per harmonic, outerwin.py:114-126), factored so the
    Pallas kernel body and the CPU equivalence tests share the math.

    ch_blk/sh_blk: (rows, K-1) signed-coefficient-folded h-table slices;
    cl_t/sl_t: (K-1, 2^m) lo-tables at amplitude 2^30 - 1.
    """
    rows, km1 = ch_blk.shape
    nl = cl_t.shape[1]
    w = spec.data_width
    acc = jnp.full((rows, nl), a0, jnp.int32)
    for k in range(km1):
        acc = acc + limb.mulsub_shift30(
            ch_blk[:, k : k + 1],
            cl_t[k : k + 1, :],
            sh_blk[:, k : k + 1],
            sl_t[k : k + 1, :],
            round=True,
            shift=30 + guard,
        )
    if spec.overflow == "saturate" and w < 32:
        acc = jnp.clip(acc, -(1 << (w - 1)), (1 << (w - 1)) - 1)
    elif w < 32:
        sw = 32 - w
        acc = (acc << sw) >> sw
    return acc


def _reduce_kernel(bias_ref, ch_ref, sh_ref, cl_ref, sl_ref, out_ref, *,
                   a0, guard, spec):
    acc = tile_window(
        ch_ref[:], sh_ref[:], cl_ref[:], sl_ref[:], a0, guard, spec
    )
    # single SMEM accumulator across grid steps (TPU lowering requires the
    # output block to equal the full array dims; (1,1) per-step blocks on a
    # (grid,1) array are rejected).  bias threads a per-dispatch value
    # through so repeated calls in a timing scan cannot be hoisted as
    # loop-invariant.
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = bias_ref[0]

    out_ref[0, 0] += jnp.sum(acc)


def make_checksum_fn(coeffs_q, spec: WindowSpec, m: int = 11,
                     rows: int = 128, interpret: bool = False):
    """Build ``fn(bias) -> int32`` computing the full-period window checksum
    with in-kernel reduction: ``fn(0) ==`` the int32-wrap sum of all 2^pw
    window samples (bit-equal to summing ``window_block_outer`` blocks).
    ``fn(b) == fn(0) + b`` — pass distinct biases when timing repeated
    dispatches.

    Grid: 2^(pw-m)/rows steps; per step one (rows, 2^m) tile is generated
    and reduced in VMEM — the window never reaches HBM.
    """
    pw = spec.phase_width
    coeffs_q = tuple(int(c) for c in coeffs_q)
    hi_np, lo_np, guard = _tables(coeffs_q, pw, m)
    ch = jnp.asarray(hi_np[:, :, 0].T.copy())  # (NH, K-1)
    sh = jnp.asarray(hi_np[:, :, 1].T.copy())
    cl = jnp.asarray(lo_np[:, :, 0].copy())  # (K-1, NL)
    sl = jnp.asarray(lo_np[:, :, 1].copy())
    nh, km1 = ch.shape
    nl = cl.shape[1]
    if nh % rows:
        raise ValueError(f"2^(pw-m) = {nh} not divisible by rows = {rows}")
    grid = nh // rows

    kern = functools.partial(
        _reduce_kernel, a0=coeffs_q[0], guard=guard, spec=spec
    )
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((rows, km1), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, km1), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((km1, nl), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((km1, nl), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i, b: (0, 0),
                                   memory_space=pltpu.SMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
    )

    def checksum(bias):
        total = call(
            jnp.atleast_1d(jnp.asarray(bias, jnp.int32)), ch, sh, cl, sl
        )
        return total[0, 0]

    return checksum


def _reduce_kernel_comp(bias_ref, hic_ref, loc_ref, hip_ref, lop_ref,
                        out_ref, *, a0_hi, a0_lo):
    """Compensated-f32 tile generate + reduce: one f32 partial
    (sum s + sum e — reading both tiles, like a pair consumer) per grid
    step.  Matches the deployment shape: traced code ships the RAW (s, e)
    pair (``kernels/compwin.py``; the TwoSum normalization is host-side
    by design — see ``normalize_pair``)."""
    from ..compwin import comp_tile

    rows = hic_ref.shape[0]
    nl = loc_ref.shape[1]
    s = jnp.full((rows, nl), a0_hi, jnp.float32)
    e = jnp.full((rows, nl), a0_lo, jnp.float32)
    hip = hip_ref[:] if hip_ref is not None else jnp.zeros((rows, 0),
                                                           jnp.float32)
    lop = lop_ref[:] if lop_ref is not None else jnp.zeros((0, nl),
                                                           jnp.float32)
    s, e = comp_tile(s, e, hic_ref[:], loc_ref[:], hip, lop)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = bias_ref[0].astype(jnp.float32)

    out_ref[0, 0] += jnp.sum(s) + jnp.sum(e)


def make_checksum_fn_comp(name_or_coeffs, pw: int, m: int = 11,
                          rows: int = 128, interpret: bool = False):
    """Compensated-f32 twin of :func:`make_checksum_fn_f32`: full-period
    (s + e) window sum with the compensated generation — grid products +
    correction accumulator (the deployment shape: raw pairs) — in-kernel, one
    f32 partial per grid step.  Timing checksum (gate correctness on tile
    values via ``compwin.comp_window_block``, not this scalar)."""
    from ..compwin import (
        DEFAULT_THRESH,
        GRID_BITS,
        _resolve_coeffs,
        _tables_comp,
        pack_tables,
    )

    coeffs = _resolve_coeffs(name_or_coeffs)
    hi_c, lo_c, hi_p, lo_p, a0_hi, a0_lo = _tables_comp(
        coeffs, pw, m, GRID_BITS, DEFAULT_THRESH
    )
    if hi_c.shape[0] == 0:
        # all |a_k| below the compensation threshold: the comp kernel's
        # BlockSpecs would be zero-width and nl would come from the (0, 1)
        # placeholder loc table — fail loudly (use make_checksum_fn_f32;
        # no catalog window hits this, only custom coeffs/thresh)
        raise ValueError(
            "no harmonic exceeds the compensation threshold; use "
            "make_checksum_fn_f32 (plain f32) for this coefficient set"
        )
    hic_np, loc_np, hip_np, lop_np = pack_tables(hi_c, lo_c, hi_p, lo_p)
    nh, c4 = hic_np.shape
    nl = loc_np.shape[1]
    p2 = hip_np.shape[1]
    if nh % rows:
        raise ValueError(f"2^(pw-m) = {nh} not divisible by rows = {rows}")
    grid = nh // rows

    has_plain = p2 > 0
    kern = functools.partial(
        _reduce_kernel_comp, a0_hi=float(a0_hi), a0_lo=float(a0_lo)
    )
    if not has_plain:
        kern = functools.partial(
            lambda b, hic, loc, out, *, k: k(b, hic, loc, None, None, out),
            k=kern,
        )
    in_specs = [
        pl.BlockSpec((rows, c4), lambda i, b: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((6 * (c4 // 4), nl), lambda i, b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(hic_np), jnp.asarray(loc_np)]
    if has_plain:
        in_specs += [
            pl.BlockSpec((rows, p2), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p2, nl), lambda i, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [jnp.asarray(hip_np), jnp.asarray(lop_np)]
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1), lambda i, b: (0, 0),
                                   memory_space=pltpu.SMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )

    def checksum(bias):
        total = call(jnp.atleast_1d(jnp.asarray(bias, jnp.int32)), *args)
        return total[0, 0]

    return checksum


def _reduce_kernel_f32(bias_ref, ch_ref, sh_ref, cl_ref, sl_ref, out_ref, *,
                       a0):
    """f32 tile generate + reduce: acc = a0 + sum_k (ch*cl - sh*sl), one
    f32 partial per grid step (the ``kernels/floatwin.py`` math).  Tables
    may be stored bfloat16 (the probe's table-bandwidth variant) — loaded
    blocks are widened to f32 before the FMA chain either way."""
    rows = ch_ref.shape[0]
    nl = cl_ref.shape[1]
    ch = ch_ref[:].astype(jnp.float32)
    sh = sh_ref[:].astype(jnp.float32)
    cl = cl_ref[:].astype(jnp.float32)
    sl = sl_ref[:].astype(jnp.float32)
    acc = jnp.full((rows, nl), a0, jnp.float32)
    for k in range(ch.shape[1]):
        acc = acc + (
            ch[:, k : k + 1] * cl[k : k + 1, :]
            - sh[:, k : k + 1] * sl[k : k + 1, :]
        )

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = bias_ref[0].astype(jnp.float32)

    out_ref[0, 0] += jnp.sum(acc)


def make_checksum_fn_f32(name_or_coeffs, pw: int, m: int = 11,
                         rows: int = 128, interpret: bool = False,
                         table_dtype=None):
    """f32 twin of :func:`make_checksum_fn` over ``kernels/floatwin.py``'s
    tables: ``fn(bias) -> float32`` full-period window sum with the
    reduction in-kernel (window never in HBM).  The sum is sequential over
    grid steps / rows-major within a tile, so it is deterministic; it is a
    *timing* checksum (f32 accumulation of 2^pw terms carries rounding —
    gate correctness on tile values, not this scalar).

    ``table_dtype=jnp.bfloat16`` stores the trig tables half-width (the
    f32-bound probe's table-bandwidth variant — costs ~3 decimal digits of
    window accuracy; measurement-only, not a production mode)."""
    from ..floatwin import _resolve_coeffs, _tables_f32

    coeffs = _resolve_coeffs(name_or_coeffs)
    hi_np, lo_np = _tables_f32(coeffs, pw, m)
    dt = table_dtype or jnp.float32
    ch = jnp.asarray(hi_np[:, :, 0].T.copy(), dt)  # (NH, K-1)
    sh = jnp.asarray(hi_np[:, :, 1].T.copy(), dt)
    cl = jnp.asarray(lo_np[:, :, 0].copy(), dt)  # (K-1, NL)
    sl = jnp.asarray(lo_np[:, :, 1].copy(), dt)
    nh, km1 = ch.shape
    nl = cl.shape[1]
    if nh % rows:
        raise ValueError(f"2^(pw-m) = {nh} not divisible by rows = {rows}")
    grid = nh // rows

    kern = functools.partial(_reduce_kernel_f32, a0=float(coeffs[0]))
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((rows, km1), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows, km1), lambda i, b: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((km1, nl), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((km1, nl), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i, b: (0, 0),
                                   memory_space=pltpu.SMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )

    def checksum(bias):
        total = call(
            jnp.atleast_1d(jnp.asarray(bias, jnp.int32)), ch, sh, cl, sl
        )
        return total[0, 0]

    return checksum
