"""FFT-wall probe, part 6: the fused 64M single-frame gen+FFT with the
MXU backend (rfft_power_split fft_mode="mxu": even/odd split to one 32M
complex transform through the matmul DFT stages + O(N) unpack) vs XLA's
64M rfft.  Amortized (REPS in-dispatch, rolled input), interleaved.
"""

import json
import time

import numpy as np

t0 = time.time()
REPS = 4


def _stamp(msg):
    print(f"# [{time.time() - t0:7.1f}s] {msg}", flush=True)


def _sync_time(fn, reps=3):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, reps=reps)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.outerwin import window_block_outer
    from blackman_harris_win_tpu.pipeline.spectral import (
        rfft_power_split,
        window_scale,
    )
    from blackman_harris_win_tpu.windows import catalog

    _stamp(f"devices: {jax.devices()}")
    pw6 = 26
    n7 = 1 << pw6
    spec6 = WindowSpec(pw6, 32, overflow="wrap")
    q6 = catalog.get("bh7").quantized(32)
    m6 = 11
    sc7 = window_scale(spec6, catalog.get("bh7").shift)
    x7 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (n7,), jnp.float32))()
    x7.block_until_ready()

    def windowed(xv):
        wq = window_block_outer(0, n7 >> m6, q6, spec6, m=m6)
        return xv * (wq.astype(jnp.float32) * jnp.float32(sc7))

    def fused_rfft(xv):
        return jnp.sum(jnp.abs(jnp.fft.rfft(windowed(xv))) ** 2)

    def fused_mxu(xv):
        return jnp.sum(rfft_power_split(windowed(xv), "mxu"))

    def timed(tag, fn):
        @jax.jit
        def run(xv):
            def body(acc, i):
                return acc + fn(jnp.roll(xv, i)), None

            s, _ = lax.scan(body, jnp.float32(0),
                            jnp.arange(REPS, dtype=jnp.int32))
            return s

        t = _sync_time(lambda: run(x7)) / REPS
        print(json.dumps({"variant": tag,
                          "msamples_per_s_in": round(n7 / t / 1e6, 1),
                          "seconds_per_rep": round(t, 5)}), flush=True)
        return t

    _stamp("agreement")
    vr = float(jax.jit(fused_rfft)(x7))
    vm = float(jax.jit(fused_mxu)(x7))
    rel = abs(vr - vm) / abs(vr)
    print(json.dumps({"variant": "L_agreement_rel", "value": rel}),
          flush=True)
    assert rel < 1e-4, rel

    ts_r, ts_m = [], []
    for _ in range(3):
        ts_r.append(timed("L_fused_rfft", fused_rfft))
        ts_m.append(timed("L_fused_mxu_split", fused_mxu))
    tr, tm = float(np.median(ts_r)), float(np.median(ts_m))
    print(json.dumps({"variant": "L_summary",
                      "rfft_msps": round(n7 / tr / 1e6, 1),
                      "mxu_msps": round(n7 / tm / 1e6, 1),
                      "speedup": round(tr / tm, 3)}), flush=True)
    _stamp("done")


if __name__ == "__main__":
    main()
