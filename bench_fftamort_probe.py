"""FFT-wall probe, part 4: dispatch-floor-free rates (scanned reps).

Parts 1-3 all timed single dispatches of ~30-60 ms — i.e. AT the ~27 ms
tunnel dispatch floor, which hides the true kernel rates (CLAUDE.md:
below ~16M input the floor dominates ANY pipeline bench; these 64M FFT
payloads turn out to be floor-scale too).  Every variant here runs
REPS=8 iterations inside ONE dispatch via lax.scan (input rolled per rep
to defeat CSE; the roll adds one elementwise pass, identical across
variants), so the floor amortizes to ~3 ms/rep.

Variants:
  J_roll_only            : the harness pass alone (subtract from others)
  J_rfft_64M             : XLA rfft, one 64M real frame
  J_rfft_1Mx128          : XLA rfft, 128 x 1M frames (welch FFT core)
  J_cfft_1Mx64           : XLA cfft, 64 x 1M (packed core)
  J_3stage_1Mx64         : MXU 3-stage matmul FFT, 64 x 1M complex
  J_welch_rfft           : full config-4 welch analyzer, rfft path
  J_welch_packed_3stage  : full analyzer, packed frames + MXU 3-stage
Rates are per REAL input sample for welch/rfft rows, per complex sample
for cfft/3stage rows.
"""

import json
import time

import numpy as np

t0 = time.time()
REPS = 8


def _stamp(msg):
    print(f"# [{time.time() - t0:7.1f}s] {msg}", flush=True)


def _sync_time(fn, reps=3):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, reps=reps)


def dft_mat(r: int):
    k = np.arange(r)
    ang = -2.0 * np.pi * (k[:, None] * k[None, :] % r) / r
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import (
        window_values,
    )
    from blackman_harris_win_tpu.pipeline.spectral import (
        frames_view,
        welch_power,
        window_scale,
    )
    from blackman_harris_win_tpu.windows import catalog

    _stamp(f"devices: {jax.devices()}")
    hi = lax.Precision.HIGHEST

    def amortized(body_of_x, x, n_per_rep, tag, unit="msamples_per_s"):
        @jax.jit
        def run(xv):
            def body(acc, i):
                xr = jnp.roll(xv, i, axis=-1)
                return acc + body_of_x(xr), None

            s, _ = lax.scan(body, jnp.float32(0),
                            jnp.arange(REPS, dtype=jnp.int32))
            return s

        t = _sync_time(lambda: run(x))
        per = t / REPS
        print(json.dumps({"variant": tag,
                          unit: round(n_per_rep / per / 1e6, 1),
                          "seconds_per_rep": round(per, 5)}), flush=True)
        return per

    n7 = 1 << 26
    x7 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (n7,), jnp.float32))()
    x7.block_until_ready()

    _stamp("J_roll_only")
    t_roll = amortized(lambda xr: jnp.sum(xr[:8]), x7, n7, "J_roll_only")
    _stamp("J_rfft_64M")
    amortized(lambda xr: jnp.sum(jnp.abs(jnp.fft.rfft(xr)) ** 2), x7, n7,
              "J_rfft_64M")

    xb = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (128, 1 << 20), jnp.float32))()
    xb.block_until_ready()
    _stamp("J_rfft_1Mx128")
    amortized(lambda xr: jnp.sum(jnp.abs(jnp.fft.rfft(xr, axis=-1)) ** 2),
              xb, 128 << 20, "J_rfft_1Mx128")
    _stamp("J_cfft_1Mx64")
    amortized(
        lambda xr: jnp.sum(jnp.abs(jnp.fft.fft(
            jax.lax.complex(xr[0::2], xr[1::2]), axis=-1)) ** 2),
        xb, 64 << 20, "J_cfft_1Mx64", unit="mcsamples_per_s")

    # --- MXU 3-stage over the same packed (64, 1M) complex load ---
    r1, r2, r3 = 128, 128, 64
    n = r1 * r2 * r3
    f1 = tuple(jnp.asarray(v) for v in dft_mat(r1))
    f2 = tuple(jnp.asarray(v) for v in dft_mat(r2))
    f3 = tuple(jnp.asarray(v) for v in dft_mat(r3))

    def tw(nt, a, b):
        ii, jj = np.arange(a), np.arange(b)
        ang = -2.0 * np.pi * (ii[:, None] * jj[None, :] % nt) / nt
        return (jnp.asarray(np.cos(ang).astype(np.float32)),
                jnp.asarray(np.sin(ang).astype(np.float32)))

    t1 = tw(n, r1, r2 * r3)
    t2 = tw(r2 * r3, r2, r3)

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def cein(m, xr, xi, spec):
        mr, mi = m
        yr = (jnp.einsum(spec, mr, xr, precision=hi)
              - jnp.einsum(spec, mi, xi, precision=hi))
        yi = (jnp.einsum(spec, mr, xi, precision=hi)
              + jnp.einsum(spec, mi, xr, precision=hi))
        return yr, yi

    def power3stage(zr, zi):
        """sum over batch of |FFT_1M|^2 via 3 matmul stages; input
        (..., nf, 1M) real/imag."""
        nf = zr.shape[-2]
        xr = zr.reshape(nf, r1, r2, r3)
        xi = zi.reshape(nf, r1, r2, r3)
        ar, ai = cein(f1, xr, xi, "kn,fnbc->fkbc")
        ar, ai = cmul(ar, ai, t1[0].reshape(1, r1, r2, r3),
                      t1[1].reshape(1, r1, r2, r3))
        br, bi = cein(f2, ar, ai, "kn,fanc->fakc")
        br, bi = cmul(br, bi, t2[0].reshape(1, 1, r2, r3),
                      t2[1].reshape(1, 1, r2, r3))
        cr, ci = cein(f3, br, bi, "kn,fabn->fabk")
        return cr * cr + ci * ci  # (nf, r1, r2, r3)

    _stamp("J_3stage_1Mx64")
    amortized(
        lambda xr: jnp.sum(power3stage(
            xr[0::2].reshape(64, n), xr[1::2].reshape(64, n))),
        xb, 64 << 20, "J_3stage_1Mx64", unit="mcsamples_per_s")

    # --- full welch analyzer, both FFT backends ---
    nfft, hop = 1 << 20, 1 << 19
    spec4 = WindowSpec(20, 17, overflow="saturate")
    q4 = catalog.get("bh4").quantized(17)
    sc = window_scale(spec4, catalog.get("bh4").shift)
    T = 128 * nfft
    xw = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (T,), jnp.float32))()
    xw.block_until_ready()

    def win():
        wq = window_values(jnp.arange(nfft, dtype=jnp.int32), q4, spec4)
        return wq.astype(jnp.float32) * jnp.float32(sc)

    def welch_rfft(xv):
        return jnp.sum(welch_power(xv, win(), nfft, hop))

    def welch_p3(xv):
        fr = frames_view(xv, nfft, hop) * win()
        nf = fr.shape[-2]
        if nf % 2:
            fr = jnp.pad(fr, [(0, 1), (0, 0)])
        p = power3stage(fr[0::2, :], fr[1::2, :])
        # packed + power-only: just sum everything (checksum harness);
        # the bin unpack is O(N) f32 on the frame-MEAN only (negligible),
        # so the checksum rate is the deployment rate
        return jnp.sum(p)

    _stamp("J_welch_rfft")
    amortized(welch_rfft, xw, T, "J_welch_rfft")
    _stamp("J_welch_packed_3stage")
    amortized(welch_p3, xw, T, "J_welch_packed_3stage")
    _stamp("done")


if __name__ == "__main__":
    main()
