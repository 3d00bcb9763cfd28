"""Capture jax.profiler traces for the two headline deployed configs and
distill a checked-in per-op time-share summary (VERDICT r4 item 8: the
op-model accounting needs independent corroboration).

Configs traced (one dispatch each, after warmup):
  comp_inkernel : config-15 — compensated-f32 in-kernel-reduce checksum
                  (the raw-pair deployment shape)
  fused_fft     : config-7  — 64M fused gen (outer-product fast mode) +
                  rfft + |.|^2 power spectrum
  welch_mxu     : config-4b — 1M-frame welch with the MXU matmul-DFT

Writes the trace under /tmp/bhw_trace_<cfg> and prints a JSON line per
config with the top-5 device ops by self-time share; paste the table into
BENCH_NOTES.md (the raw trace is NOT checked in).
"""

import glob
import json
import time

import numpy as np

t0 = time.time()


def _stamp(msg):
    print(f"# [{time.time() - t0:7.1f}s] {msg}", flush=True)


def summarize(trace_dir: str, top: int = 8):
    """Aggregate per-op self time from the xplane proto via
    jax.profiler.ProfileData; returns [(name, share, total_us)] for the
    device plane(s)."""
    import jax.profiler as jp

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        return None
    pd = jp.ProfileData.from_file(files[0])
    agg = {}
    for plane in pd.planes:
        name = plane.name or ""
        if "TPU" not in name and "tpu" not in name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                nm = ev.name
                agg[nm] = agg.get(nm, 0) + dur
    if not agg:  # fall back to every plane (tunnelled backends may label
        # the device plane differently)
        for plane in pd.planes:
            for line in plane.lines:
                for ev in line.events:
                    agg[(plane.name or "?") + "::" + ev.name] = (
                        agg.get((plane.name or "?") + "::" + ev.name, 0)
                        + ev.duration_ns)
    total = sum(agg.values()) or 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return [(n, round(v / total, 4), round(v / 1e3, 1)) for n, v in rows]


def main():
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.outerwin import window_block_outer
    from blackman_harris_win_tpu.kernels.pallas.outerwin_kernel import (
        make_checksum_fn_comp,
    )
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import (
        window_values,
    )
    from blackman_harris_win_tpu.pipeline.spectral import (
        welch_power,
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

    # --- comp in-kernel (config 15 shape) ---
    fn15 = make_checksum_fn_comp("bh7", pw6, m=m6, rows=256)

    @jax.jit
    def comp_inkernel(seed):
        def body(acc, i):
            return acc + fn15(i), None

        s, _ = jax.lax.scan(body, seed, jnp.arange(8, dtype=jnp.int32))
        return s

    # --- fused gen+FFT (config 7) ---
    x7 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (n7,), jnp.float32))()

    @jax.jit
    def fused(xv):
        wq = window_block_outer(0, n7 >> m6, q6, spec6, m=m6)
        xw = xv * (wq.astype(jnp.float32) * jnp.float32(sc7))
        return jnp.sum(jnp.abs(jnp.fft.rfft(xw)) ** 2)

    # --- welch mxu (config 4b) ---
    nfft, hop = 1 << 20, 1 << 19
    spec4 = WindowSpec(20, 17, overflow="saturate")
    q4 = catalog.get("bh4").quantized(17)
    sc4 = window_scale(spec4, catalog.get("bh4").shift)
    xw_in = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (128 * nfft,), jnp.float32))()

    @jax.jit
    def welch_mxu(xv):
        wq = window_values(jnp.arange(nfft, dtype=jnp.int32), q4, spec4)
        w = wq.astype(jnp.float32) * jnp.float32(sc4)
        return jnp.sum(welch_power(xv, w, nfft, hop, "mxu"))

    configs = [
        ("comp_inkernel", lambda: comp_inkernel(jnp.float32(0))),
        ("fused_fft", lambda: fused(x7)),
        ("welch_mxu", lambda: welch_mxu(xw_in)),
    ]
    for tag, fn in configs:
        _stamp(f"warm {tag}")
        float(jnp.asarray(fn()).sum())  # compile + warm
        tdir = f"/tmp/bhw_trace_{tag}"
        _stamp(f"trace {tag}")
        jax.profiler.start_trace(tdir)
        float(jnp.asarray(fn()).sum())
        jax.profiler.stop_trace()
        rows = summarize(tdir)
        print(json.dumps({"config": tag, "top_ops": rows}), flush=True)
    _stamp("done")


if __name__ == "__main__":
    main()
