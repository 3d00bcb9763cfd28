"""What bounds the native-f32 window kernel? (round-3 VERDICT item 4)

BENCH_NOTES round 3 guessed "likely VMEM-traffic-limited" from
vpu_frac 0.23.  This probe separates the hypotheses, ALL VARIANTS
INTERLEAVED IN ONE PROCESS (cross-process f32 spread can reach ~2x):

  F256 / F512 / F128   rows sweep at m=11 (tile-height / VMEM working set)
  M10 / M12            lo-split sweep (1024 / 4096 lanes; table-shape +
                       broadcast-geometry effects)
  B512                 bfloat16 tables + f32 accumulation (halves
                       table-side VMEM bytes; acc tile unchanged) —
                       measurement-only, not a production mode
  K3 / K13             3-harmonic (bh4) and 12-harmonic (synthetic) sets:
                       if throughput scales ~1/harmonics the kernel is
                       ALU/issue-bound; if it's flat-ish, per-tile
                       overhead (VMEM traffic, loop scaffolding) dominates
  F512r                repeat of F512 (in-process drift bracket)

Gates: every f32 variant's compiled checksum is compared to the jnp scan
checksum (rtol 1e-3; bf16 at 5e-2).  Prints one JSON line per variant.
"""

import json
import time

T00 = time.time()


def _stamp(s):
    print(f"# [{time.time()-T00:7.1f}s] {s}", flush=True)


def _sync_time(fn, reps=5):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, reps=reps)


def main():
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.kernels.floatwin import float_window_block
    from blackman_harris_win_tpu.kernels.pallas.outerwin_kernel import (
        make_checksum_fn_f32,
    )

    pw = 26
    n_total = 1 << pw
    reps = 16

    # synthetic 13-term set (12 harmonics) for the ALU-scaling variant:
    # geometric tail, sum-normalized-ish (values irrelevant to speed)
    k13 = tuple([0.27] + [0.73 * 0.5 ** k / 2 for k in range(12)])

    variants = [
        ("F256", dict(name="bh7", m=11, rows=256)),
        ("F512", dict(name="bh7", m=11, rows=512)),
        ("F128", dict(name="bh7", m=11, rows=128)),
        ("M10", dict(name="bh7", m=10, rows=512)),
        ("M12", dict(name="bh7", m=12, rows=256)),
        ("B512", dict(name="bh7", m=11, rows=512, bf16=True)),
        ("K3", dict(name="bh4", m=11, rows=512)),
        # 12 harmonics at rows=512 OOMs scoped VMEM (18.5M > 16M): rows=256
        ("K13", dict(name=k13, m=11, rows=256)),
        ("F512r", dict(name="bh7", m=11, rows=512)),
    ]

    # jnp reference checksums per (name, m) for the gates
    ref_cache = {}

    def ref_checksum(name, m):
        key = (name if isinstance(name, str) else "k13", m)
        if key in ref_cache:
            return ref_cache[key]
        rows_scan = 1 << (pw - m - 3)  # 8 scan blocks
        blk = rows_scan << m
        nb = n_total // blk

        @jax.jit
        def jnp_sum():
            def body(acc, i):
                wv = float_window_block(i * blk, rows_scan, name, pw, m=m)
                return acc + jnp.sum(wv), None
            s_, _ = jax.lax.scan(body, jnp.float32(0),
                                 jnp.arange(nb, dtype=jnp.int32))
            return s_

        ref_cache[key] = float(jnp_sum())
        return ref_cache[key]

    built = {}
    for label, cfg in variants:
        if label in built:
            continue
        _stamp(f"build+gate {label}")
        fn = make_checksum_fn_f32(
            cfg["name"], pw, m=cfg["m"], rows=cfg["rows"],
            table_dtype=jnp.bfloat16 if cfg.get("bf16") else None,
        )
        got = float(jax.jit(fn)(jnp.int32(0)))
        want = ref_checksum(cfg["name"], cfg["m"])
        tol = 5e-2 if cfg.get("bf16") else 1e-3
        assert abs(got - want) <= tol * max(1.0, abs(want)), \
            (label, got, want)
        built[label] = fn

    nharm = {"F256": 6, "F512": 6, "F128": 6, "M10": 6, "M12": 6,
             "B512": 6, "K3": 3, "K13": 12, "F512r": 6}

    for label, cfg in variants:
        fn = built[label]

        @jax.jit
        def gen(seed, f=fn):
            def body(acc, i):
                return acc + f(i), None
            s_, _ = jax.lax.scan(body, seed,
                                 jnp.arange(reps, dtype=jnp.int32))
            return s_

        t = _sync_time(lambda: gen(jnp.float32(0)))
        v = reps * n_total / t / 1e6
        print(json.dumps({
            "variant": label, "msamp_s": round(v, 1),
            "gsamp_s": round(v / 1e3, 2),
            "harmonics": nharm[label],
            "gharm_s": round(v * nharm[label] / 1e3, 1),
            **{k: str(x) for k, x in cfg.items()},
        }), flush=True)


if __name__ == "__main__":
    main()
