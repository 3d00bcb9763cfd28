"""FFT-wall probe (round 5, VERDICT r4 item 1).

The deployed analyzer is FFT-bound: window gen runs 13-25 Gsamp/s but the
Welch analyzer ingests ~1.35 G and the fused 64M gen+FFT ~1.3 G.  Nobody
has measured what XLA's FFT itself achieves on this chip, or whether the
classic real-FFT tricks help:

  A. raw FFT cost vs a single-pass HBM bound, per shape:
       rfft over (128, 1M) f32      -- the Welch config-4 FFT core
       cfft over (64, 1M) c64       -- the packed equivalent (half count)
       rfft over 64M f32            -- the fused config-7 FFT core
       cfft over 32M c64            -- the half-length building block
  B. full Welch analyzer (config-4 shape): fft_mode="rfft" vs "packed",
     interleaved A/B/A/B in ONE process (cross-process readings vary).
  C. fused 64M gen+FFT: plain rfft vs rfft-power-via-half-length-CFFT
     (split even/odd samples into one 32M c64 FFT + O(N) twiddle unpack).

Single-pass HBM byte models (absolute ceilings -- a real FFT is multi-pass):
  c64 fft of n:  16n bytes (8 in + 8 out per point)
  f32 rfft of n: 4n in + 8(n/2) out = 8n bytes
If the measured rate sits at a small fraction of this bound, the FFT is
pass/compute-limited and halving the FFT *count* (packing) should show up
~1:1 in the analyzer rate.

One JSON line per measurement.  Writes nothing to HBM that isn't needed:
inputs synthesized on device, outputs reduced to scalars.
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


def main():
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import (
        window_values,
    )
    from blackman_harris_win_tpu.pipeline.spectral import (
        welch_power,
        window_scale,
    )
    from blackman_harris_win_tpu.utils.profiling import roofline_fields
    from blackman_harris_win_tpu.windows import catalog

    _stamp(f"devices: {jax.devices()}")

    # ------------------------------------------------------------------
    # A. raw FFT shapes
    # ------------------------------------------------------------------
    nfft = 1 << 20

    @jax.jit
    def x_batch128():
        return jax.random.normal(jax.random.PRNGKey(0), (128, nfft),
                                 jnp.float32)

    xb = x_batch128()
    xb.block_until_ready()

    @jax.jit
    def rfft_batch(xv):
        return jnp.sum(jnp.abs(jnp.fft.rfft(xv, axis=-1)) ** 2)

    @jax.jit
    def cfft_batch64(xv):
        z = jax.lax.complex(xv[0::2], xv[1::2])  # (64, 1M) c64
        return jnp.sum(jnp.abs(jnp.fft.fft(z, axis=-1)) ** 2)

    _stamp("compiling A (batched 1M)")
    n_real = 128 * nfft
    t = _sync_time(lambda: rfft_batch(xb))
    print(json.dumps({"variant": "A_rfft_1Mx128",
                      "msamples_per_s_in": round(n_real / t / 1e6, 1),
                      "seconds": round(t, 4),
                      **roofline_fields(t, bytes_moved=8 * n_real)}),
          flush=True)
    t = _sync_time(lambda: cfft_batch64(xb))
    print(json.dumps({"variant": "A_cfft_1Mx64_packed_core",
                      "msamples_per_s_in": round(n_real / t / 1e6, 1),
                      "seconds": round(t, 4),
                      **roofline_fields(t, bytes_moved=16 * (n_real // 2))}),
          flush=True)

    n7 = 1 << 26

    @jax.jit
    def x_64m():
        return jax.random.normal(jax.random.PRNGKey(2), (n7,), jnp.float32)

    x7 = x_64m()
    x7.block_until_ready()

    @jax.jit
    def rfft_64m(xv):
        return jnp.sum(jnp.abs(jnp.fft.rfft(xv)) ** 2)

    @jax.jit
    def cfft_32m(xv):
        z = jax.lax.complex(xv[0::2], xv[1::2])
        return jnp.sum(jnp.abs(jnp.fft.fft(z)) ** 2)

    _stamp("compiling A (64M)")
    t = _sync_time(lambda: rfft_64m(x7))
    print(json.dumps({"variant": "A_rfft_64M",
                      "msamples_per_s_in": round(n7 / t / 1e6, 1),
                      "seconds": round(t, 4),
                      **roofline_fields(t, bytes_moved=8 * n7)}), flush=True)
    t = _sync_time(lambda: cfft_32m(x7))
    print(json.dumps({"variant": "A_cfft_32M_half_core",
                      "msamples_per_s_in": round(n7 / t / 1e6, 1),
                      "seconds": round(t, 4),
                      **roofline_fields(t, bytes_moved=16 * (n7 // 2))}),
          flush=True)

    # ------------------------------------------------------------------
    # B. full Welch analyzer, rfft vs packed, interleaved
    # ------------------------------------------------------------------
    hop = nfft // 2
    spec4 = WindowSpec(20, 17, overflow="saturate")
    q4 = catalog.get("bh4").quantized(17)
    sc = window_scale(spec4, catalog.get("bh4").shift)
    T = 128 * nfft

    @jax.jit
    def x_welch():
        return jax.random.normal(jax.random.PRNGKey(1), (T,), jnp.float32)

    xw = x_welch()
    xw.block_until_ready()

    def make_analyzer(mode):
        @jax.jit
        def analyzer(xv):
            wq = window_values(jnp.arange(nfft, dtype=jnp.int32), q4, spec4)
            w = wq.astype(jnp.float32) * jnp.float32(sc)
            return jnp.sum(welch_power(xv, w, nfft, hop, mode))

        return analyzer

    an_r = make_analyzer("rfft")
    an_p = make_analyzer("packed")
    _stamp("compiling B (welch rfft/packed)")
    # agreement gate before timing (derived: f32 coherence budget)
    vr = float(an_r(xw))
    vp = float(an_p(xw))
    rel = abs(vr - vp) / abs(vr)
    assert rel < 1e-5, f"packed disagrees with rfft: rel={rel}"
    print(json.dumps({"variant": "B_agreement_rel", "value": rel}),
          flush=True)

    ts_r, ts_p = [], []
    for _ in range(3):  # interleaved A/B
        ts_r.append(_sync_time(lambda: an_r(xw), reps=3))
        ts_p.append(_sync_time(lambda: an_p(xw), reps=3))
    tr, tp = float(np.median(ts_r)), float(np.median(ts_p))
    print(json.dumps({"variant": "B_welch_rfft",
                      "msamples_per_s_in": round(T / tr / 1e6, 1),
                      "seconds": round(tr, 4)}), flush=True)
    print(json.dumps({"variant": "B_welch_packed",
                      "msamples_per_s_in": round(T / tp / 1e6, 1),
                      "seconds": round(tp, 4),
                      "speedup_vs_rfft": round(tr / tp, 3)}), flush=True)

    # ------------------------------------------------------------------
    # C. fused 64M gen+FFT: rfft vs half-length-CFFT unpack
    # ------------------------------------------------------------------
    from blackman_harris_win_tpu.kernels.outerwin import window_block_outer
    from blackman_harris_win_tpu.pipeline.spectral import rfft_power_split

    spec6 = WindowSpec(26, 32, overflow="wrap")
    q6 = catalog.get("bh7").quantized(32)
    sc7 = window_scale(spec6, catalog.get("bh7").shift)
    m6 = 11

    def make_fused(mode):
        @jax.jit
        def fused(xv):
            wq = window_block_outer(0, n7 >> m6, q6, spec6, m=m6)
            xw_ = xv * (wq.astype(jnp.float32) * jnp.float32(sc7))
            if mode == "rfft":
                return jnp.sum(jnp.abs(jnp.fft.rfft(xw_)) ** 2)
            return jnp.sum(rfft_power_split(xw_))

        return fused

    f_r = make_fused("rfft")
    f_h = make_fused("half")
    _stamp("compiling C (fused rfft/half-cfft)")
    vr = float(f_r(x7))
    vh = float(f_h(x7))
    rel = abs(vr - vh) / abs(vr)
    assert rel < 1e-4, f"half-cfft disagrees: rel={rel}"
    print(json.dumps({"variant": "C_agreement_rel", "value": rel}),
          flush=True)

    ts_r, ts_h = [], []
    for _ in range(3):
        ts_r.append(_sync_time(lambda: f_r(x7), reps=3))
        ts_h.append(_sync_time(lambda: f_h(x7), reps=3))
    tr, th = float(np.median(ts_r)), float(np.median(ts_h))
    print(json.dumps({"variant": "C_fused_rfft",
                      "msamples_per_s_in": round(n7 / tr / 1e6, 1),
                      "seconds": round(tr, 4)}), flush=True)
    print(json.dumps({"variant": "C_fused_half_cfft",
                      "msamples_per_s_in": round(n7 / th / 1e6, 1),
                      "seconds": round(th, 4),
                      "speedup_vs_rfft": round(tr / th, 3)}), flush=True)
    _stamp("done")


if __name__ == "__main__":
    main()
