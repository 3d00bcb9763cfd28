"""Fused Taylor generation + in-kernel reduction (the taylor twin of
``outerwin_kernel.py``'s checksum kernels).

Measures the gather-free blocked Taylor engine
(``kernels/taylor.py:taylor_sincos_block``) without the scan-harness
materialize+reduce wall: each grid step generates one (rows, R) tile —
R = 2^(PW-LS-2) residuals per ROM step — and accumulates a single int32
into SMEM; the samples never touch HBM.

The ROM streaming uses the same trick as the blocked jnp kernel, expressed
as a BlockSpec: per grid step the tile consumes ``rows`` CONSECUTIVE ROM
entries, so the index_map walks the quarter-wave ROM **modularly**
(``(t0/rows + i) % (2^LS/rows)``) — the circular wrap costs nothing and
there is no gather anywhere.  The tay1 correction runs on the int32 lanes
via the 15-bit-limb ``mul_shift30`` exactly as in the jnp path (shared
``_tay1``), so the per-tile values are bit-identical to
``taylor_sincos_block`` and the in-kernel checksum equals the jnp scan
checksum bit-for-bit (int32 wrap addition) — the in-bench golden gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..taylor import _rom, _tay1


def _kernel(n0_ref, rom_ref, out_ref, *, pw, w, ls, rows):
    rsh = pw - ls - 2
    r = 1 << rsh
    i = pl.program_id(0)
    t0 = n0_ref[0] >> rsh
    steps_mask = (1 << (pw - rsh)) - 1
    ti = (
        t0 + i * rows
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    ) & steps_mask
    quadrant = ti >> ls

    mem_cos = rom_ref[:, 0:1]
    mem_sin = rom_ref[:, 1:2]
    acnt = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
    mem_cos, mem_sin = _tay1(mem_cos, mem_sin, acnt, pw - ls - 3, ls, w)

    sw = 32 - w
    wrap_w = (lambda v: (v << sw) >> sw) if sw else (lambda v: v)
    nc, ns = wrap_w(-mem_cos), wrap_w(-mem_sin)
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

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = n0_ref[1]  # bias (anti-hoist for timing scans)

    out_ref[0, 0] += jnp.sum(c) + jnp.sum(s)


def make_checksum_fn_taylor(pw: int, w: int, ls: int, rows: int = 64,
                            interpret: bool = False):
    """Build ``fn(n0, bias) -> int32``: the int32-wrap sum of (cos + sin)
    over one full 2^pw period starting at ``n0`` (must be aligned to
    rows * 2^(PW-LS-2)), reduction in-kernel.  Requires the tay1 regime
    (PW - LS > 2) and rows dividing 2^LS."""
    if pw - ls <= 2:
        raise ValueError("in-kernel taylor checksum needs the tay1 regime "
                         "(PW - LS > 2)")
    if w > 32:
        raise ValueError("taylor supports data_width <= 32")
    nrom = 1 << ls
    if nrom % rows:
        raise ValueError(f"rows = {rows} must divide 2^LS = {nrom}")
    rsh = pw - ls - 2
    grid = (1 << (pw - rsh)) // rows  # 4 * 2^ls / rows steps
    rom = jnp.asarray(_rom(ls, w))
    nblk = nrom // rows

    kern = functools.partial(_kernel, pw=pw, w=w, ls=ls, rows=rows)
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(
                    (rows, 2),
                    lambda i, b: (((b[0] >> (pw - ls - 2)) // rows + i)
                                  % nblk, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i, b: (0, 0),
                                   memory_space=pltpu.SMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
    )

    def checksum(n0, bias):
        sc = jnp.stack([jnp.asarray(n0, jnp.int32),
                        jnp.asarray(bias, jnp.int32)])
        return call(sc, rom)[0, 0]

    return checksum
