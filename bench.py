"""Benchmark: streaming quantized window generation on one TPU chip.

Headline metric: Msamples/s generating a 64M-point (2^26) Blackman-Harris
window with the fixed-point CORDIC engine — the reference's implied
throughput is 1 sample/clock/core x 400 MHz = 400 Msamples/s on a Kintex
Ultrascale XCKU040-2 (BASELINE.md).  ``vs_baseline`` is the speedup over
that 400 Msamples/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.window import window_samples
    from blackman_harris_win_tpu.windows import catalog

    # BH-4 at 17-bit (-92 dB sizing rule), 64M points, generated in blocks.
    # (The -180 dB BH-7 W=32 config moves to the Pallas two-limb kernel.)
    pw, w = 26, 17
    spec = WindowSpec(phase_width=pw, data_width=w)
    d = catalog.get("bh4")
    coeffs_q = d.quantized(w)

    block = 1 << 22  # 4M samples per call

    @jax.jit
    def gen_block(n0):
        n = n0 + jnp.arange(block, dtype=jnp.int32)
        return window_samples(n, coeffs_q, spec)

    # warm up / compile
    out = gen_block(jnp.int32(0))
    out.block_until_ready()

    n_total = spec.n
    nblocks = n_total // block
    t0 = time.time()
    for i in range(nblocks):
        out = gen_block(jnp.int32(i * block))
    out.block_until_ready()
    dt = time.time() - t0

    msamps = n_total / dt / 1e6
    result = {
        "metric": "bh4_w17_64M_window_gen_throughput",
        "value": round(msamps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msamps / 400.0, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
