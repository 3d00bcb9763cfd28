"""FFT-wall probe, part 2: 4-step (Bailey) decomposition of the Welch FFT.

Part-1 findings (bench_fftwall_probe.py, BENCH_NOTES round 5): XLA's rfft
is already real-optimized (1M rfft costs ~1/3 of a 1M cfft), frame packing
buys only ~5%, and monolithic large cffts are pathological (32M cfft:
35 Msamp/s).  The open question: are XLA's *batched small* cffts so much
faster than its monolithic 1M FFT that the classic 4-step factorization
(1M = 1024 x 1024: batched 1k FFTs + twiddle + transpose + batched 1k
FFTs) beats the native path?

For the Welch POWER consumer the 4-step gets cheaper than the general
case: the output bin permutation (k = k1 + N1*k2 from the (k1, k2)
matrix) commutes with |.|^2 and the frame mean, so the final transpose
runs once on the f32 (N1, N2) mean-power matrix instead of per-frame c64.

Variants (one process, interleaved):
  D_cfft_1k_batched / D_cfft_4k_batched: raw batched small-cfft rates
  E_welch_rfft_amortized: config-4 welch, 4 reps chained in-dispatch
      (removes the ~28 ms dispatch floor from the comparison)
  E_welch_4step_amortized: same, FFT stage = packed frames + 4-step cfft
  F agreement: 4-step welch == rfft welch (f32 budget)
"""

import json
import time

import numpy as np

t0 = time.time()


def _stamp(msg):
    print(f"# [{time.time() - t0:7.1f}s] {msg}", flush=True)


def _sync_time(fn, reps=5):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, reps=reps)


def make_twiddle(n1: int, n2: int) -> np.ndarray:
    """W_N^{n2*k1} table, (n2, k1) layout to match the step-1 output
    A[n2, k1]; computed in f64 on host (angles exact to f64)."""
    n = n1 * n2
    k1 = np.arange(n1)
    nn2 = np.arange(n2)
    ang = -2.0 * np.pi * (nn2[:, None] * k1[None, :] % n) / n
    return (np.cos(ang) + 1j * np.sin(ang)).astype(np.complex64)


def main():
    import jax
    import jax.numpy as jnp

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

    # ------------------------------------------------------------------
    # D. raw batched small-cfft rates (64M total points each)
    # ------------------------------------------------------------------
    for size, batch in ((1024, 65536), (4096, 16384)):
        @jax.jit
        def x_c(size=size, batch=batch):
            xr = jax.random.normal(jax.random.PRNGKey(0), (batch, size),
                                   jnp.float32)
            xi = jax.random.normal(jax.random.PRNGKey(1), (batch, size),
                                   jnp.float32)
            return jax.lax.complex(xr, xi)

        xc = x_c()
        xc.block_until_ready()

        @jax.jit
        def cf(z):
            return jnp.sum(jnp.abs(jnp.fft.fft(z, axis=-1)) ** 2)

        _stamp(f"compiling D ({size} x {batch})")
        t = _sync_time(lambda: cf(xc))
        n_tot = size * batch
        print(json.dumps({"variant": f"D_cfft_{size}x{batch}",
                          "mcsamples_per_s": round(n_tot / t / 1e6, 1),
                          "seconds": round(t, 4)}), flush=True)
        del xc

    # ------------------------------------------------------------------
    # E. full welch analyzer, amortized (4 reps in-dispatch), rfft vs
    #    packed-4step
    # ------------------------------------------------------------------
    nfft, hop = 1 << 20, 1 << 19
    n1 = n2 = 1 << 10
    spec4 = WindowSpec(20, 17, overflow="saturate")
    q4 = catalog.get("bh4").quantized(17)
    sc = window_scale(spec4, catalog.get("bh4").shift)
    T = 128 * nfft
    reps_in = 4

    @jax.jit
    def x_welch():
        return jax.random.normal(jax.random.PRNGKey(1), (T,), jnp.float32)

    xw = x_welch()
    xw.block_until_ready()

    tw = jnp.asarray(make_twiddle(n1, n2))  # (n2, n1) c64

    def win():
        wq = window_values(jnp.arange(nfft, dtype=jnp.int32), q4, spec4)
        return wq.astype(jnp.float32) * jnp.float32(sc)

    def welch_4step(xv):
        """Packed frames -> 4-step 1M cfft -> power -> frame mean.
        Output: (nfft//2+1,) like welch_power (psd bins)."""
        fr = frames_view(xv, nfft, hop) * win()  # (nF, nfft)
        nf = fr.shape[-2]
        if nf % 2:
            fr = jnp.pad(fr, [(0, 1), (0, 0)])
        z = jax.lax.complex(fr[0::2, :], fr[1::2, :])  # (nF/2, 1M)
        m = z.reshape(-1, n1, n2)
        # step 1: DFT over n1 (stride n2): transpose -> batched fft
        a = jnp.fft.fft(jnp.swapaxes(m, -1, -2), axis=-1)  # A[n2, k1]
        a = a * tw  # twiddle W_N^{n2 k1}
        # step 3: DFT over n2 for each k1: transpose back -> batched fft
        b = jnp.fft.fft(jnp.swapaxes(a, -1, -2), axis=-1)  # B[k1, k2]
        p = jnp.abs(b) ** 2  # (nF/2, n1, n2)
        # packed unpack on the power: |Z(k)|^2 + |Z(-k)|^2 over the
        # FLATTENED bin index k = k1 + n1*k2.  -k mod N maps (k1, k2) ->
        # ((n1-k1) % n1, (n2-k2-(k1>0)) % n2)... simpler: flatten power
        # to bin order first (one f32 transpose of the mean), then do the
        # same reversal as frame_mean_power.
        pm = jnp.sum(p, axis=0)  # (n1, n2) summed over frame pairs
        pk = pm.T.reshape(-1)  # bin order: k = k1 + n1*k2
        k = nfft // 2 + 1
        pk_rev = jnp.concatenate([pk[:1], pk[1:][::-1]])
        ps = 0.5 * (pk[:k] + pk_rev[:k])
        return ps / nf

    @jax.jit
    def an_rfft_amort(xv):
        def body(acc, i):
            xr = jnp.roll(xv, i)  # defeat CSE across reps
            return acc + jnp.sum(welch_power(xr, win(), nfft, hop)), None

        s, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(reps_in, dtype=jnp.int32))
        return s

    @jax.jit
    def an_4step_amort(xv):
        def body(acc, i):
            xr = jnp.roll(xv, i)
            return acc + jnp.sum(welch_4step(xr)), None

        s, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(reps_in, dtype=jnp.int32))
        return s

    # F: agreement before timing
    _stamp("compiling F (agreement)")
    a = np.asarray(jax.jit(
        lambda xv: welch_power(xv, win(), nfft, hop))(xw), np.float64)
    b = np.asarray(jax.jit(welch_4step)(xw), np.float64)
    rel = float(np.max(np.abs(a - b) / (np.abs(a) + 1e-300)))
    print(json.dumps({"variant": "F_agreement_rel", "value": rel}),
          flush=True)
    assert rel < 1e-4, rel

    _stamp("compiling E (amortized welch)")
    ts_r, ts_p = [], []
    for _ in range(3):
        ts_r.append(_sync_time(lambda: an_rfft_amort(xw), reps=3))
        ts_p.append(_sync_time(lambda: an_4step_amort(xw), reps=3))
    tr, tp = float(np.median(ts_r)), float(np.median(ts_p))
    n_eff = reps_in * T
    print(json.dumps({"variant": "E_welch_rfft_amortized",
                      "msamples_per_s_in": round(n_eff / tr / 1e6, 1),
                      "seconds": round(tr, 4)}), flush=True)
    print(json.dumps({"variant": "E_welch_4step_amortized",
                      "msamples_per_s_in": round(n_eff / tp / 1e6, 1),
                      "seconds": round(tp, 4),
                      "speedup_vs_rfft": round(tr / tp, 3)}), flush=True)
    _stamp("done")


if __name__ == "__main__":
    main()
