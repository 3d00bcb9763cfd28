"""Pallas-fused Welch front half: framing + window + frame-pair packing +
DFT stage 1 + twiddle, in ONE kernel.

The round-5 FFT-wall work (BENCH_NOTES) bypassed XLA's FFT with matmul
DFT stages (fft_mode="mxu", 1.3x the rfft analyzer).  This kernel removes
the remaining pipeline overhead ahead of the matmuls: at 50% overlap the
Welch frame PAIRS are contiguous in x (pair b's even frame starts at
b*nfft, odd at b*nfft + hop), so the kernel reads x exactly once —

  per grid cell (pair b, column tile):
    3 blocks of x_padded, each half a frame tall (the hop overlap makes
    the middle block shared between the even and odd frame),
    2 window blocks;
    z = (even * w) + j (odd * w)                  [pack]
    y = M_r0 @ z                                  [MXU, r0-contraction]
    out = y * W_N^{k0 * rest}                     [stage-1 twiddle]

— and the framing / window multiply / packing passes (plus their HBM
round trips) disappear into the stage-1 matmul's operand reads.  Chip
measurement: the full analyzer runs 2.1x the rfft path (3.5 vs 1.67
Gsamp/s amortized), vs 1.3x for the unfused matmul stages.

Requires: hop == nfft/2, leading radix r0 == 128 (i.e. nfft >= 2^19
through `_mxu_radices`), rest = nfft/r0 divisible by the column tile.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@lru_cache(maxsize=8)
def _tables(nfft: int, r0: int):
    """DFT-r0 matrix + stage-1 twiddle W_nfft^{k0*rest}, f64-host-exact
    (real, imag) f32 pairs."""
    k = np.arange(r0)
    ang = -2.0 * np.pi * (k[:, None] * k[None, :] % r0) / r0
    m0 = (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))
    rest = nfft // r0
    ii, jj = np.arange(r0), np.arange(rest)
    ang = -2.0 * np.pi * (ii[:, None] * jj[None, :] % nfft) / nfft
    t1 = (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))
    return m0, t1


def _kernel(xa, xb, xc, w0, w1, m0r, m0i, twr, twi, outr, outi, *,
            npair: int, mask_last: bool):
    even = jnp.concatenate([xa[:], xb[:]], axis=0)  # (r0, jt)
    odd = jnp.concatenate([xb[:], xc[:]], axis=0)
    if mask_last:
        # odd frame count: the last pair's odd member is the zero pad
        # frame (its rows would otherwise read real tail samples)
        odd = jnp.where(pl.program_id(0) == npair - 1, 0.0, odd)
    w = jnp.concatenate([w0[:], w1[:]], axis=0)
    zr = even * w
    zi = odd * w
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    yr = dot(m0r[:], zr) - dot(m0i[:], zi)
    yi = dot(m0r[:], zi) + dot(m0i[:], zr)
    outr[0] = yr * twr[:] - yi * twi[:]
    outi[0] = yr * twi[:] + yi * twr[:]


def welch_stage1_fused(x, win, nfft: int, r0: int = 128, jt: int = 512,
                       interpret: bool = False):
    """Stage-1 output A[b, k0, rest] = tw1 * (DFT_r0 over n0 of the packed
    windowed frame pairs of ``x``), framing fused (hop = nfft/2).

    x: (T,) float32 with T a multiple of hop; win: (nfft,) float32.
    Returns (out_r, out_i): (npair, r0, nfft//r0) f32 each, plus the
    frame count nf.
    """
    t = x.shape[-1]
    hop = nfft // 2
    if x.ndim != 1 or t % hop or t < nfft:
        raise ValueError("welch_stage1_fused needs 1-D x, T % (nfft/2) == 0")
    rest = nfft // r0
    if rest % jt:
        jt = rest  # small rest: one column tile
    nf = (t - nfft) // hop + 1
    npair = (nf + 1) // 2
    mask_last = bool(nf % 2)
    half = r0 // 2  # rows per block (= hop / rest)

    pad = npair * nfft + hop - t
    xp = jnp.concatenate([x, jnp.zeros((pad,), jnp.float32)])
    xp = xp.reshape(-1, rest)
    wv = jnp.asarray(win, jnp.float32).reshape(r0, rest)
    (m0r, m0i), (t1r, t1i) = (
        tuple(jnp.asarray(v) for v in p) for p in _tables(nfft, r0))

    bs = lambda im: pl.BlockSpec((half, jt), im, memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, npair=npair, mask_last=mask_last)
    out = pl.pallas_call(
        kern,
        grid=(npair, rest // jt),
        in_specs=[
            bs(lambda b, j: (2 * b, j)),      # even top
            bs(lambda b, j: (2 * b + 1, j)),  # even bottom == odd top
            bs(lambda b, j: (2 * b + 2, j)),  # odd bottom
            bs(lambda b, j: (0, j)),          # window top
            bs(lambda b, j: (1, j)),          # window bottom
            pl.BlockSpec((r0, r0), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r0, r0), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r0, jt), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r0, jt), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, r0, jt), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r0, jt), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npair, r0, rest), jnp.float32),
            jax.ShapeDtypeStruct((npair, r0, rest), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xp, xp, wv, wv, m0r, m0i, t1r, t1i)
    return out[0], out[1], nf
