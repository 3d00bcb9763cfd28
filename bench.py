"""Benchmark: streaming quantized window generation on one TPU chip.

Headline: the north-star config — 64M-point (2^26) 7-term Blackman-Harris
window at W=32 (<= -180 dB sidelobe floor), bit-exact fixed-point CORDIC
(two-limb int32 datapath), generated in ONE device dispatch (16 x 4M-block
lax.scan with a checksum reduction so nothing elides).

The reference's implied throughput is 1 sample/clock/core x 400 MHz
= 400 Msamples/s on a Kintex Ultrascale XCKU040-2 (BASELINE.md).
``vs_baseline`` = speedup over that.  Timing is host-synced (scalar
checksum transfer — block_until_ready is unreliable on this backend) and
covers REPS=4 consecutive 64M windows per dispatch so the ~30 ms tunnel
round-trip latency amortizes the way a streaming deployment would; the
per-dispatch round-trip is still fully included once per timing.

Perf accounting (BENCH_NOTES.md): this config is COMPUTE-bound — the
window is reduced to a checksum on device and never written to HBM
("accounting" field says so explicitly).  ``vpu_frac`` is the measured
fraction of the analytic VPU integer-op roofline
(utils/profiling.cordic_window_int_ops; ~4.3k int-ops/sample).

Correctness gate before timing: a fresh random 4096-sample block (seed
printed, clock-derived) asserted 0-LSB against the native C++ oracle, plus
Python-golden spot checks — the full chain of evidence, re-rolled each run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import window_values
    from blackman_harris_win_tpu.model import golden, native
    from blackman_harris_win_tpu.utils.profiling import (
        cordic_window_int_ops,
        roofline_fields,
    )
    from blackman_harris_win_tpu.windows import catalog

    pw, w = 26, 32
    spec = WindowSpec(phase_width=pw, data_width=w, overflow="wrap")
    coeffs_q = catalog.get("bh7").quantized(w)

    block = 1 << 22
    reps_per_dispatch = 4
    nblocks = reps_per_dispatch * (1 << pw) // block

    @jax.jit
    def gen_all(seed):
        def body(acc, i):
            n = i * block + jnp.arange(block, dtype=jnp.int32)
            wv = window_values(n, coeffs_q, spec)
            return acc + jnp.sum(wv), None

        s, _ = jax.lax.scan(
            body, seed, jnp.arange(nblocks, dtype=jnp.int32)
        )
        return s

    # correctness gate: random 4096-sample block vs the native C++ oracle
    # (seeded per run), plus Python-golden spot checks
    seed = int(time.time()) & 0xFFFFFF
    n0 = int(np.random.default_rng(seed).integers(0, (1 << pw) - 4096))

    @jax.jit
    def check_block(b0):
        n = b0 + jnp.arange(4096, dtype=jnp.int32)
        return window_values(n, coeffs_q, spec)

    blk = np.asarray(check_block(jnp.int32(n0))).astype(np.int64)
    want = native.win_hls(n0 + np.arange(4096, dtype=np.int64), coeffs_q, pw, w)
    assert (blk == want).all(), (
        f"golden mismatch: seed={seed} n0={n0} "
        f"first_bad={int(np.argmax(blk != want))}"
    )
    for i in (0, 1, 2047, 4095):
        assert int(blk[i]) == golden.win_cosine_sum_hls(n0 + i, coeffs_q, pw, w)

    int(gen_all(jnp.int32(0)))  # compile + warm
    times = []
    for r in range(5):
        t0 = time.time()
        int(gen_all(jnp.int32(r)))  # host-synced: full completion
        times.append(time.time() - t0)
    dt = float(np.median(times))

    nsamples = reps_per_dispatch * (1 << pw)
    msamps = nsamples / dt / 1e6
    int_ops = cordic_window_int_ops(nsamples, 7, w, wide=True)
    fields = roofline_fields(dt, int_ops=int_ops)
    print(
        json.dumps(
            {
                "metric": "bh7_w32_64M_window_gen_throughput_-180dB",
                "value": round(msamps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msamps / 400.0, 2),
                **fields,
                "accounting": "compute-roofline; checksum reduction on "
                "device, window never written to HBM.  vpu_frac is "
                "utilization of the FMA-credited op ceiling (2 ops/slot; "
                "physically <= 1); opmodel_nofma_x compares against the "
                "no-fusion op model and may read > 1 where FMA fusion "
                "covers it (see BENCH_NOTES.md)",
                "golden_seed": seed,
            }
        )
    )


if __name__ == "__main__":
    main()
