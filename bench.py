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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import window_values
    from blackman_harris_win_tpu.model import golden
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

    # correctness spot-check vs the exact scalar golden model
    @jax.jit
    def first_block():
        n = jnp.arange(4096, dtype=jnp.int32)
        return window_values(n, coeffs_q, spec)

    blk = np.asarray(first_block())
    for i in (0, 1, 1234, 4095):
        assert int(blk[i]) == golden.win_cosine_sum_hls(i, coeffs_q, pw, w), i

    int(gen_all(jnp.int32(0)))  # compile + warm
    times = []
    for r in range(5):
        t0 = time.time()
        int(gen_all(jnp.int32(r)))  # host-synced: full completion
        times.append(time.time() - t0)
    dt = float(np.median(times))

    msamps = reps_per_dispatch * (1 << pw) / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "bh7_w32_64M_window_gen_throughput_-180dB",
                "value": round(msamps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msamps / 400.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
