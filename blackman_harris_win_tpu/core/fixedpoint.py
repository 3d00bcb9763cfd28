"""Fixed-point integer primitives shared by every kernel.

The reference design is pure integer/fixed-point hardware: values live in
N-bit two's-complement registers (VHDL ``std_logic_vector`` + signed
arithmetic, HLS ``ap_int<N>``), shifts are arithmetic, and rounding happens at
two specific points with round-half-up semantics.  This module gives those
semantics names, for both traced jnp arrays (int32/int64 lanes) and plain
Python ints (the scalar golden models).

Bit-level contracts reproduced here (with reference citations):

- two's-complement wrap to an arbitrary register width — ``ap_int<N>``
  assignment semantics (e.g. ``hls/windows/win_function.h:60-62``);
- round-half-up off bit 0:  ``if v(0)='1' then v(W downto 1)+1``
  (``src/bh_win_3term.vhd:264-280``);
- round-half-up off bit 1:  ``if v(1)='1' then v(W+1 downto 2)+1``
  (``src/bh_win_3term.vhd:295-306``);
- saturation to ``0x7FF..`` / ``0x800..`` on overflow (``src/tay1_order.vhd:601-617``);
- coefficient quantization ``round(a * (2^(W-shift) - 1))``
  (``hls/windows/win_function.cpp:176-177, 349-355``).

Everything is dtype-polymorphic: pass Python ints for exact scalar modeling,
numpy or jnp arrays for vectorized use.  jnp's ``>>`` on signed dtypes is an
arithmetic shift, matching VHDL/ap_int semantics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def min_int_dtype(width: int):
    """Smallest jnp signed dtype holding a two's-complement value of `width` bits."""
    if width <= 8:
        return jnp.int8
    if width <= 16:
        return jnp.int16
    if width <= 32:
        return jnp.int32
    if width <= 64:
        return jnp.int64
    raise ValueError(f"width {width} exceeds 64-bit lanes; use the two-limb path")


def wrap(v, width: int):
    """Two's-complement wrap of ``v`` to ``width`` bits (ap_int<width> assignment).

    Works on Python ints (arbitrary precision) and numpy/jnp signed arrays.
    For arrays the carrier dtype must be at least ``width`` bits; the result
    stays in the carrier dtype but its value is the sign-extended low
    ``width`` bits of ``v``.
    """
    if isinstance(v, int):
        m = v & ((1 << width) - 1)
        return m - (1 << width) if m >> (width - 1) else m
    nbits = v.dtype.itemsize * 8
    if width == nbits:
        return v
    if width > nbits:
        raise ValueError(f"cannot wrap to {width} bits in a {nbits}-bit lane")
    s = nbits - width
    # Left shift wraps mod 2^nbits; arithmetic right shift sign-extends.
    return (v << s) >> s


def ashr(v, k):
    """Arithmetic shift right (sign-extending) — VHDL slice ``v(H downto k)``."""
    return v >> k


def round_half_up_bit0(v):
    """Round off the LSB, half rounds up: ``(v >> 1) + v(0)``.

    Matches the per-product rounding stage of every window core,
    e.g. ``src/bh_win_3term.vhd:264-280``.
    """
    return (v >> 1) + (v & 1)


def round_half_up_bit1(v):
    """Round off the two LSBs keeping bit-1 as the round bit:
    ``(v >> 2) + v(1)`` — the final output rounding stage,
    e.g. ``src/bh_win_3term.vhd:295-306``.
    """
    return (v >> 2) + ((v >> 1) & 1)


def saturate(v, width: int):
    """Clamp to the signed ``width``-bit range (tay1_order-style overflow clamp,
    ``src/tay1_order.vhd:601-617``)."""
    hi = (1 << (width - 1)) - 1
    lo = -(1 << (width - 1))
    if isinstance(v, int):
        return max(lo, min(hi, v))
    return jnp.clip(v, lo, hi) if isinstance(v, jnp.ndarray) else np.clip(v, lo, hi)


def quantize_coeff(a: float, width: int, shift: int) -> int:
    """Quantize a float window coefficient: ``round(a * (2^(width-shift) - 1))``.

    ``shift=1`` for 2/3/4-term windows, ``shift=2`` for 5/7-term (flat-top /
    unity headroom rule) — ``hls/windows/win_function.cpp:176-177, 349-355``
    and ``math/window_test.m:121-139``.
    """
    return int(round(a * (2.0 ** (width - shift) - 1.0)))


def quantize_coeffs(coeffs, width: int, shift: int) -> tuple[int, ...]:
    return tuple(quantize_coeff(a, width, shift) for a in coeffs)


def to_signed_python(v) -> int:
    """Convert a numpy scalar / 0-d array to an exact Python int."""
    return int(np.asarray(v))
