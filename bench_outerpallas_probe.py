"""Fast-mode kernel bound WITHOUT the harness wall (round-2 VERDICT item 3).

Times, interleaved in ONE process on the chip:

  J. the jnp outer-product generator through the scan+checksum harness
     (bench_all config 6 — capped by the ~19 Gsamp/s materialize+reduce
     harness ceiling, BENCH_NOTES probe E)
  P<rows>. the SAME generation math with the reduction inside a Pallas
     kernel (kernels/pallas/outerwin_kernel.py): one int32 partial per grid
     step, window never in HBM — at several tile heights

In-bench golden gate: the pallas checksum equals the jnp path's full-period
scan checksum bit-for-bit before any timing.

Prints one JSON line per variant.
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
    from blackman_harris_win_tpu.kernels.outerwin import window_block_outer
    from blackman_harris_win_tpu.kernels.pallas.outerwin_kernel import (
        make_checksum_fn,
    )
    from blackman_harris_win_tpu.utils.profiling import outer_window_int_ops
    from blackman_harris_win_tpu.windows import catalog

    pw, m = 26, 11
    spec = WindowSpec(pw, 32, overflow="wrap")
    q = catalog.get("bh7").quantized(32)
    n_total = 1 << pw

    # --- golden gate: jnp scan checksum over the full period ---
    rows_scan = 1 << 12
    blk = rows_scan << m
    nb = n_total // blk

    @jax.jit
    def jnp_checksum():
        def body(acc, i):
            wv = window_block_outer(i * blk, rows_scan, q, spec, m=m)
            return acc + jnp.sum(wv), None
        s_, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(nb, dtype=jnp.int32))
        return s_

    _stamp("compiling jnp golden pass")
    want = int(jnp_checksum())
    _stamp("jnp golden done")
    fn0 = make_checksum_fn(q, spec, m=m, rows=128)
    got = int(jax.jit(fn0)(jnp.int32(0)))
    _stamp("pallas golden done")
    assert got == want, f"pallas checksum {got} != jnp {want}"
    print(json.dumps({"golden_gate": "pass", "checksum": got}), flush=True)

    reps = 16

    # --- J: jnp scan harness (the wall) ---
    @jax.jit
    def gen_jnp(seed):
        def body(acc, i):
            wv = window_block_outer((i & (nb - 1)) * blk, rows_scan, q, spec, m=m)
            return acc + jnp.sum(wv), None
        s_, _ = jax.lax.scan(
            body, seed, jnp.arange(reps * nb, dtype=jnp.int32))
        return s_

    _stamp("timing J")
    t = _sync_time(lambda: gen_jnp(jnp.int32(0)))
    vj = reps * n_total / t / 1e6
    print(json.dumps({"variant": "J_jnp_scan_harness",
                      "msamples_per_s": round(vj, 1)}), flush=True)

    # --- P<rows>: pallas in-kernel reduction, tile-height sweep ---
    # rows=512 exceeds the 16 MB scoped-VMEM limit (22.11M measured: the
    # (rows, 2048) int32 tile plus the limb-product temporaries) -- the
    # sweep tops out at 256, where the curve is already flat.
    results = {}
    for rows in (64, 128, 256):
        fn = make_checksum_fn(q, spec, m=m, rows=rows)

        @jax.jit
        def gen_pl(seed, fn=fn):
            def body(acc, i):
                return acc + fn(i), None
            s_, _ = jax.lax.scan(
                body, seed, jnp.arange(reps, dtype=jnp.int32))
            return s_

        _stamp(f"timing P{rows}")
        t = _sync_time(lambda: gen_pl(jnp.int32(0)))
        v = reps * n_total / t / 1e6
        ops = outer_window_int_ops(reps * n_total, 7)
        results[rows] = v
        from blackman_harris_win_tpu.utils.profiling import roofline_fields

        print(json.dumps({
            "variant": f"P{rows}_pallas_inkernel_reduce",
            "msamples_per_s": round(v, 1),
            **roofline_fields(t, int_ops=ops),
        }), flush=True)

    # --- J again (drift check within the process) ---
    t = _sync_time(lambda: gen_jnp(jnp.int32(1)))
    print(json.dumps({"variant": "J_repeat",
                      "msamples_per_s": round(reps * n_total / t / 1e6, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
