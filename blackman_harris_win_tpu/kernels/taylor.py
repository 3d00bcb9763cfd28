"""Vectorized quarter-wave-LUT + 1st-order-Taylor sine/cosine (the fast path).

TPU re-expression of ``src/taylor_sincos.vhd`` + ``src/tay1_order.vhd``: the
block-ROM becomes a VMEM-resident table driven by an XLA gather, and the two
DSP48 MACCs per sample become fused multiply-shift lanes.  Bit-exact against
``model/golden.py:taylor_sincos`` (same reference citations there).

Amplitude is ~2^(W-1) — full scale, twice the CORDIC flavors — matching the
reference (ROM entries scale (2^(W-1)-1), taylor_sincos.vhd:101-102).

The per-width arithmetic split is faithful: W<19 accumulates in the wide
(48-bit DSP P) domain then slices; W>=19 slices the product first, adds in W
bits, and clamps negative results to +max ("scale overflow",
tay1_order.vhd:601-617).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _rom(lut_size: int, data_width: int):
    """Quarter-wave ROM: (2^LS, 2) array of (cos, sin) entries
    (src/taylor_sincos.vhd:91-109)."""
    n = 1 << lut_size
    ii = np.arange(n)
    ang = ii * math.pi / (2.0 * n)
    amp = 2.0 ** (data_width - 1) - 1.0
    cos_e = np.floor(amp * np.cos(ang) + 0.5).astype(np.int64)
    sin_e = np.floor(amp * np.sin(ang) + 0.5).astype(np.int64)
    dt = np.int32 if data_width <= 32 else np.int64
    return np.stack([cos_e, sin_e], axis=-1).astype(dt)


def taylor_sincos(n, phase_width: int, data_width: int, lut_size: int):
    """(cos, sin) at sample indices ``n`` (any shape; reduced mod 2^PW)."""
    pw, w, ls = phase_width, data_width, lut_size
    if ls >= pw:
        raise ValueError("LUT_SIZE must be < PHASE_WIDTH (src/win_selector.vhd:68)")
    if w > 32:
        # the int32-lane datapath would silently truncate the ROM values;
        # fail loudly instead (project rule: guarded or lane-clean).  The
        # reference's DSP48 MACC datapaths top out at 32-bit outputs too.
        raise ValueError("taylor_sincos supports data_width <= 32")

    rom = jnp.asarray(_rom(ls, w))
    dt = rom.dtype

    cnt = jnp.asarray(n, jnp.int32) & ((1 << pw) - 1)
    quadrant = cnt >> (pw - 2)
    ph = cnt & ((1 << (pw - 2)) - 1)

    if pw - ls < 2:
        addr = ph << (ls - pw + 2)
        ent = rom[addr]
        mem_cos, mem_sin = ent[..., 0], ent[..., 1]
    elif pw - ls == 2:
        ent = rom[ph]
        mem_cos, mem_sin = ent[..., 0], ent[..., 1]
    else:
        stage = pw - ls - 3
        addr = ph >> (pw - ls - 2)
        acnt = ph & ((1 << (pw - ls - 2)) - 1)
        ent = rom[addr]
        mem_cos, mem_sin = _tay1(
            ent[..., 0], ent[..., 1], acnt, stage, ls, w
        )

    nbits = jnp.iinfo(dt).bits
    sw = nbits - w
    wrap_w = (lambda v: (v << sw) >> sw) if sw else (lambda v: v)
    nc, ns = wrap_w(-mem_cos.astype(dt)), wrap_w(-mem_sin.astype(dt))
    c = jnp.where(
        quadrant == 0,
        mem_cos,
        jnp.where(quadrant == 1, ns, jnp.where(quadrant == 2, nc, mem_sin)),
    )
    s = jnp.where(
        quadrant == 0,
        mem_sin,
        jnp.where(quadrant == 1, mem_cos, jnp.where(quadrant == 2, ns, nc)),
    )
    return c, s


def _tay1(cos_v, sin_v, acnt, stage: int, val_shift: int, w: int):
    """1st-order correction (src/tay1_order.vhd); see golden.tay1_correction.

    The ~(w+21)-bit products (the reference's 48-bit DSP MACCs) run on int32
    lanes via the 15-bit-limb ``mul_shift30`` decomposition whenever
    w <= 30 — this is the TPU-native path (no int64 emulation).  Shifted
    floor semantics are preserved exactly: the W<19 branch's
    ``(cos<<X - mpi*sin) >> X`` equals ``cos + ((mpi*(-sin)) >> X)``
    identically (low X bits of the accumulator come solely from the
    product), so only a multiply-shift primitive is needed.
    """
    from .pallas.limb import mul_shift30, mul_small_shift

    xshift = 19 + val_shift
    ramb_pi = int(math.floor(math.pi * 2.0 ** (17 - stage) + 0.5))

    # All widths run on int32 lanes (TPU-native): |mpi| < pi*2^18 always
    # (ramb_pi*acnt < pi*2^(20-PW+LS)*2^(PW-LS-2)), so w <= 30 uses the
    # 15-bit-limb mul_shift30 (|sin| < 2^29) and w in {31, 32} the
    # small-multiplier decomposition (|sin| < 2^31).
    mpi = (ramb_pi * acnt).astype(jnp.int32)
    cos_l, sin_l = cos_v.astype(jnp.int32), sin_v.astype(jnp.int32)
    if w <= 30:
        mshift = lambda a, c: mul_shift30(a, c, xshift)
    else:
        mshift = lambda a, c: mul_small_shift(a, c, xshift)
    sw = 32 - w

    wrap_w = lambda v: (v << sw) >> sw

    if w < 19:
        # 48-bit accumulate then slice (no saturation), tay1_order.vhd:180-504
        cos_p = wrap_w(cos_l + mshift(mpi, -sin_l))
        sin_p = wrap_w(sin_l + mshift(mpi, cos_l))
        return cos_p.astype(jnp.int32), sin_p.astype(jnp.int32)

    # W>=19: product sliced to W bits first, W-bit add (wrap), clamp
    # negatives to +max ("scale overflow", tay1_order.vhd:601-617)
    bb_sin = wrap_w(mshift(mpi, sin_l))
    bb_cos = wrap_w(mshift(mpi, cos_l))
    cos_p = wrap_w(cos_l - bb_sin)
    sin_p = wrap_w(sin_l + bb_cos)
    clamp = (1 << (w - 1)) - 1
    cos_p = jnp.where(cos_p < 0, clamp, cos_p)
    sin_p = jnp.where(sin_p < 0, clamp, sin_p)
    return cos_p.astype(jnp.int32), sin_p.astype(jnp.int32)
