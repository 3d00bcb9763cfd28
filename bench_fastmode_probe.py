"""Fast-mode bound isolation (round-1 VERDICT item 4).

The outer-product generator measures ~2.6 Gsamp/s vs a ~17 Gsamp/s naive
VPU op-model bound (~200 ops/sample @ 3.5 Top/s).  This probe times, in ONE
process (cross-process bench readings vary >=4%; CLAUDE.md), interleaved:

  A. the real outer-product generator (kernels/outerwin.py) — baseline
  B. a stripped kernel: per harmonic ONE int32 rank-1 multiply + accumulate
     (the irreducible 6-multiply skeleton; if this also caps low, int32
     VPU multiplies are the bound, not the limb bookkeeping)
  C. the same skeleton with f32 FMA (probes whether int32 multiply is
     slower than f32 on the VPU; f32 lacks the precision for -180 dB,
     perf probe only)
  D. variant A with a 2x larger block (scan-overhead probe)
  E. memory-streaming bound: generate-and-checksum of an iota (pure
     bandwidth/dispatch skeleton, no multiplies)

Prints one JSON line per variant; run standalone on the chip.
"""

import json

import numpy as np


def _sync_time(fn, reps=3):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, reps=reps)


def main():
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.outerwin import (
        _tables,
        window_block_outer,
    )
    from blackman_harris_win_tpu.windows import catalog

    pw = 26
    spec = WindowSpec(pw, 32, overflow="wrap")
    q = catalog.get("bh7").quantized(32)
    m = 11
    nl = 1 << m

    def scan_bench(body_fn, rows, label, reps_total=8):
        blk = rows << m
        nb = (1 << pw) // blk

        @jax.jit
        def gen(seed):
            def body(acc, i):
                wv = body_fn((i & (nb - 1)) * blk, rows)
                return acc + jnp.sum(wv).astype(acc.dtype), None
            s_, _ = jax.lax.scan(
                body, seed, jnp.arange(reps_total * nb, dtype=jnp.int32))
            return s_

        t = _sync_time(lambda: gen(jnp.int32(0)))
        v = reps_total * (1 << pw) / t / 1e6
        print(json.dumps({"variant": label, "msamples_per_s": round(v, 1),
                          "rows": rows}), flush=True)
        return v

    rows = 1 << 11  # 4M block, the bench_all config

    # --- A: real generator ---
    scan_bench(lambda n0, r: window_block_outer(n0, r, q, spec, m=m),
               rows, "A_outer_full")

    # --- B: int32 multiply skeleton (6 rank-1 mults + accumulate) ---
    hi_np, lo_np, _ = _tables(tuple(int(c) for c in q), pw, m)
    hi_t, lo_t = jnp.asarray(hi_np), jnp.asarray(lo_np)

    def skel_i32(n0, r):
        h0 = jnp.asarray(n0, jnp.int32) >> m
        hi_blk = jax.lax.dynamic_slice(
            hi_t, (jnp.int32(0), h0, jnp.int32(0)), (hi_t.shape[0], r, 2))
        acc = jnp.full((r, nl), 0, jnp.int32)
        for i in range(hi_t.shape[0]):
            acc = acc + hi_blk[i, :, 0][:, None] * lo_t[i, :, 0][None, :]
        return acc.reshape(r * nl)

    scan_bench(skel_i32, rows, "B_skeleton_int32_mul")

    # --- C: f32 FMA skeleton ---
    hi_f, lo_f = hi_t.astype(jnp.float32), lo_t.astype(jnp.float32)

    def skel_f32(n0, r):
        h0 = jnp.asarray(n0, jnp.int32) >> m
        hi_blk = jax.lax.dynamic_slice(
            hi_f, (jnp.int32(0), h0, jnp.int32(0)), (hi_f.shape[0], r, 2))
        acc = jnp.zeros((r, nl), jnp.float32)
        for i in range(hi_f.shape[0]):
            acc = acc + hi_blk[i, :, 0][:, None] * lo_f[i, :, 0][None, :]
        return acc.reshape(r * nl)

    scan_bench(skel_f32, rows, "C_skeleton_f32_fma")

    # --- D: bigger block ---
    scan_bench(lambda n0, r: window_block_outer(n0, r, q, spec, m=m),
               1 << 12, "D_outer_8M_block")

    # --- E: dispatch/stream skeleton (no multiplies) ---
    def skel_iota(n0, r):
        n = jnp.asarray(n0, jnp.int32) + jnp.arange(r * nl, dtype=jnp.int32)
        return n ^ (n >> 7)

    scan_bench(skel_iota, rows, "E_iota_stream")


if __name__ == "__main__":
    main()
