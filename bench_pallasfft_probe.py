"""FFT-wall probe, part 7: Pallas-fused framing+window+pack+DFT-stage-1.

The v2 (transpose-free) mxu welch spends its 56 ms spread over framing
(3.2 ms), packing, three matmul stages and their operand copies.  At 50%
overlap the frame pairs are CONTIGUOUS in x (pair b's even frame starts
at b*nfft, odd at b*nfft + hop), so one Pallas kernel can read x once and
emit the stage-1 output directly:

  per grid cell (pair b, column tile jt):
    3 x (64, jt) blocks of x_padded  (even = A||B, odd = B||C — the hop
    overlap makes the middle block shared)
    2 x (64, jt) blocks of the window
    zr = even*win, zi = odd*win                  (pack: z = even + j odd)
    yr = Mr@zr - Mi@zi, yi = Mr@zi + Mi@zr       (MXU, 128-contraction)
    out = y * tw1_tile                           (stage-1 twiddle fused)

Stages 2-3 run as tensordots on the kernel's output.  Measured against
the v2 jnp mxu path and the rfft path, interleaved, amortized.
"""

import functools
import json
import time

import numpy as np

t0 = time.time()
REPS = 8


def _stamp(msg):
    print(f"# [{time.time() - t0:7.1f}s] {msg}", flush=True)


def _sync_time(fn, *a, reps=3):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, *a, reps=reps)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import (
        window_values,
    )
    from blackman_harris_win_tpu.pipeline.spectral import (
        welch_power,
        window_scale,
    )
    from blackman_harris_win_tpu.windows import catalog

    _stamp(f"devices: {jax.devices()}")
    hi = lax.Precision.HIGHEST

    nfft, hop = 1 << 20, 1 << 19
    r0, r1, r2 = 128, 128, 64
    rest = r1 * r2  # 8192
    npair = 128  # 255 frames -> 128 pairs (odd member of the last is pad)
    T = 128 * nfft
    jt = 512  # column tile

    spec4 = WindowSpec(20, 17, overflow="saturate")
    q4 = catalog.get("bh4").quantized(17)
    sc = window_scale(spec4, catalog.get("bh4").shift)

    def dft_mat(r):
        k = np.arange(r)
        ang = -2.0 * np.pi * (k[:, None] * k[None, :] % r) / r
        return (np.cos(ang).astype(np.float32),
                np.sin(ang).astype(np.float32))

    m0r_, m0i_ = dft_mat(r0)
    # stage-1 twiddle W_N^{k0 * rest_idx}, (r0, rest) host-exact
    ii, jj = np.arange(r0), np.arange(rest)
    ang = -2.0 * np.pi * (ii[:, None] * jj[None, :] % nfft) / nfft
    t1r_ = np.cos(ang).astype(np.float32)
    t1i_ = np.sin(ang).astype(np.float32)

    def kernel(xa, xb, xc, w0, w1, m0r, m0i, twr, twi, outr, outi):
        even = jnp.concatenate([xa[:], xb[:]], axis=0)  # (128, jt)
        odd = jnp.concatenate([xb[:], xc[:]], axis=0)
        # 255 frames -> the last pair's odd member is the ZERO pad frame
        # (its rows would otherwise read real tail samples)
        odd = jnp.where(pl.program_id(0) == npair - 1, 0.0, odd)
        w = jnp.concatenate([w0[:], w1[:]], axis=0)
        zr = even * w
        zi = odd * w
        dn = (((1,), (0,)), ((), ()))
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=dn,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        yr = dot(m0r[:], zr) - dot(m0i[:], zi)
        yi = dot(m0r[:], zi) + dot(m0i[:], zr)
        outr[0] = yr * twr[:] - yi * twi[:]
        outi[0] = yr * twi[:] + yi * twr[:]

    def stage1_fused(x, win):
        # x (T,) f32 -> xp rows of 8192, padded by hop (64 rows)
        xp = jnp.concatenate([x, jnp.zeros((hop,), jnp.float32)])
        xp = xp.reshape(-1, rest)  # (16448, 8192); 64-row blocks
        wv = win.reshape(r0, rest)  # (128, 8192); 64-row blocks

        grid = (npair, rest // jt)
        bs = lambda im: pl.BlockSpec((64, jt), im, memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                bs(lambda b, j: (2 * b, j)),      # A
                bs(lambda b, j: (2 * b + 1, j)),  # B
                bs(lambda b, j: (2 * b + 2, j)),  # C
                bs(lambda b, j: (0, j)),          # win top
                bs(lambda b, j: (1, j)),          # win bottom
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
        )(xp, xp, xp, wv, wv,
          jnp.asarray(m0r_), jnp.asarray(m0i_),
          jnp.asarray(t1r_), jnp.asarray(t1i_))
        return out

    # stages 2-3 (tensordot), power, reversal — the bespoke tail
    m1 = tuple(jnp.asarray(v) for v in dft_mat(r1))
    m2 = tuple(jnp.asarray(v) for v in dft_mat(r2))
    i2, j2 = np.arange(r1), np.arange(r2)
    a2 = -2.0 * np.pi * (i2[:, None] * j2[None, :] % (r1 * r2)) / (r1 * r2)
    t2 = (jnp.asarray(np.cos(a2).astype(np.float32).T),
          jnp.asarray(np.sin(a2).astype(np.float32).T))  # (n2, k1)

    def tail(xr, xi):
        # (B, k0, n1, n2): contract n1 -> (B, k0, n2, k1)
        xr = xr.reshape(npair, r0, r1, r2)
        xi = xi.reshape(npair, r0, r1, r2)
        yr = (jnp.tensordot(xr, m1[0], axes=[[2], [1]], precision=hi)
              - jnp.tensordot(xi, m1[1], axes=[[2], [1]], precision=hi))
        yi = (jnp.tensordot(xr, m1[1], axes=[[2], [1]], precision=hi)
              + jnp.tensordot(xi, m1[0], axes=[[2], [1]], precision=hi))
        twr = t2[0].reshape(1, 1, r2, r1)
        twi = t2[1].reshape(1, 1, r2, r1)
        xr = yr * twr - yi * twi
        xi = yr * twi + yi * twr
        # contract n2 (axis 2) -> (B, k0, k1, k2)
        yr = (jnp.tensordot(xr, m2[0], axes=[[2], [1]], precision=hi)
              - jnp.tensordot(xi, m2[1], axes=[[2], [1]], precision=hi))
        yi = (jnp.tensordot(xr, m2[1], axes=[[2], [1]], precision=hi)
              + jnp.tensordot(xi, m2[0], axes=[[2], [1]], precision=hi))
        p = jnp.sum(yr * yr + yi * yi, axis=0)  # (k0, k1, k2)
        # bin k = k0 + r0*k1 + r0*r1*k2 -> natural order
        pk = jnp.transpose(p, (2, 1, 0)).reshape(nfft)
        k = nfft // 2 + 1
        pk_rev = jnp.concatenate([pk[:1], jnp.flip(pk[1:])])
        return 0.5 * (pk[:k] + pk_rev[:k]) / 255.0

    def win():
        wq = window_values(jnp.arange(nfft, dtype=jnp.int32), q4, spec4)
        return wq.astype(jnp.float32) * jnp.float32(sc)

    def welch_fused(xv):
        sr, si = stage1_fused(xv, win())
        return jnp.sum(tail(sr, si))

    def welch_mxu(xv):
        return jnp.sum(welch_power(xv, win(), nfft, hop, "mxu"))

    def welch_rfft(xv):
        return jnp.sum(welch_power(xv, win(), nfft, hop, "rfft"))

    xw = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (T,), jnp.float32))()
    xw.block_until_ready()

    _stamp("agreement (first pallas compile of the session may be slow)")
    vr = float(jax.jit(welch_rfft)(xw))
    vf = float(jax.jit(welch_fused)(xw))
    rel = abs(vr - vf) / abs(vr)
    print(json.dumps({"variant": "M_agreement_rel", "value": rel}),
          flush=True)
    assert rel < 1e-4, rel

    def timed(tag, fn):
        @jax.jit
        def run(xv):
            def body(acc, i):
                return acc + fn(jnp.roll(xv, i)), None

            s, _ = lax.scan(body, jnp.float32(0),
                            jnp.arange(REPS, dtype=jnp.int32))
            return s

        t = _sync_time(run, xw) / REPS
        print(json.dumps({"variant": tag,
                          "msamples_per_s_in": round(T / t / 1e6, 1),
                          "seconds_per_rep": round(t, 5)}), flush=True)

    for _ in range(2):  # interleaved
        timed("M_welch_rfft", welch_rfft)
        timed("M_welch_mxu_v2", welch_mxu)
        timed("M_welch_pallas_stage1", welch_fused)
    _stamp("done")


if __name__ == "__main__":
    main()
