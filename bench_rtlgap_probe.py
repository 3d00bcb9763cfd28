"""RTL-vs-HLS contract gap isolation (round-2 VERDICT item 6).

Round-2 measured the RTL (VHDL) rounding contract ~9% behind the HLS
contract at the same 64M/W=32 BH-7 config (1037 vs 1138 Msamp/s) — but in
DIFFERENT processes, and cross-process readings vary >=4%.  This probe
times, interleaved in ONE process:

  H.  full HLS-contract window (window_values, radix-4 _cos_wide4 datapath)
  R.  full RTL-contract window (window_values_rtl, radix-2^s dds cos)
  Hc. single-harmonic HLS cosine only (_cos_wide4)
  Rc. single-harmonic RTL cosine only (cordic_dds_i32, r2s path)
  H2/R2. the H and R variants again (drift check)

The cos-only pair separates the rotation-engine cost from the
product/adder-tree contract cost: RTL runs W-1 iterations (one FEWER than
HLS's W) but pays per-term round-half-up + W+1/W wraps and a radix-4
carried tree; HLS pays one more iteration but its W=32 accumulate is free
int32 wrap.  Verdict goes to BENCH_NOTES.md.

In-bench golden gates: both contracts checked against their native oracles
on a 2048-sample block before timing.
"""

import json
import time

import numpy as np

T00 = time.time()


def _stamp(s):
    print(f"# [{time.time()-T00:7.1f}s] {s}", flush=True)


def _sync_time(fn, reps=5):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, reps=reps)


def main():
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.cordic_wide import (
        cordic_dds_i32,
    )
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import (
        _cos_wide4,
        window_values,
    )
    from blackman_harris_win_tpu.model import native
    from blackman_harris_win_tpu.windows import catalog

    pw, w = 26, 32
    q = catalog.get("bh7").quantized(w)
    spec_h = WindowSpec(pw, w, rounding="hls", overflow="wrap")
    spec_r = WindowSpec(pw, w, rounding="rtl", overflow="wrap")
    blk = 1 << 22
    nb = (1 << pw) // blk
    reps = 2

    # --- golden gates (both contracts, 2048 samples vs native oracles) ---
    chk_n = (1 << 20) + np.arange(2048, dtype=np.int64)
    got_h = np.asarray(jax.jit(lambda: window_values(
        jnp.asarray(chk_n, jnp.int32), q, spec_h))()).astype(np.int64)
    want_h = native.win_hls(chk_n, q, pw, w)
    assert (got_h == want_h).all(), "HLS golden mismatch"
    got_r = np.asarray(jax.jit(lambda: window_values(
        jnp.asarray(chk_n, jnp.int32), q, spec_r))()).astype(np.int64)
    want_r = native.win_rtl(chk_n, q, pw, w, 1)
    assert (got_r == want_r).all(), "RTL golden mismatch"
    _stamp("golden gates pass")

    def scan_window(spec):
        @jax.jit
        def gen(seed):
            def body(acc, i):
                n = (i & (nb - 1)) * blk + jnp.arange(blk, dtype=jnp.int32)
                return acc + jnp.sum(window_values(n, q, spec)), None
            s_, _ = jax.lax.scan(
                body, seed, jnp.arange(reps * nb, dtype=jnp.int32))
            return s_
        return gen

    def scan_cos(cos_fn):
        mask = (1 << pw) - 1

        @jax.jit
        def gen(seed):
            def body(acc, i):
                n = (i & (nb - 1)) * blk + jnp.arange(blk, dtype=jnp.int32)
                return acc + jnp.sum(cos_fn(n & mask)), None
            s_, _ = jax.lax.scan(
                body, seed, jnp.arange(reps * nb, dtype=jnp.int32))
            return s_
        return gen

    variants = [
        ("H_full_hls", scan_window(spec_h)),
        ("R_full_rtl", scan_window(spec_r)),
        ("Hc_cos_hls_wide4", scan_cos(lambda p: _cos_wide4(p, pw, w))),
        ("Rc_cos_rtl_dds", scan_cos(
            lambda p: cordic_dds_i32(p, pw, w, 1)[0])),
    ]
    results = {}
    for label, fn in variants + [("H2_full_hls", variants[0][1]),
                                 ("R2_full_rtl", variants[1][1])]:
        _stamp(f"timing {label}")
        t = _sync_time(lambda: fn(jnp.int32(0)))
        v = reps * (1 << pw) / t / 1e6
        results[label] = v
        print(json.dumps({"variant": label,
                          "msamples_per_s": round(v, 1)}), flush=True)

    h = (results["H_full_hls"] + results["H2_full_hls"]) / 2
    r = (results["R_full_rtl"] + results["R2_full_rtl"]) / 2
    print(json.dumps({
        "summary": "rtl_vs_hls_interleaved",
        "hls_msps": round(h, 1), "rtl_msps": round(r, 1),
        "rtl_over_hls": round(r / h, 4),
        "cos_rtl_over_hls": round(
            results["Rc_cos_rtl_dds"] / results["Hc_cos_hls_wide4"], 4),
    }), flush=True)


if __name__ == "__main__":
    main()
