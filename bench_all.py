"""Extended benchmark suite (one JSON line per metric, BASELINE configs).

Runs on the real chip; complements bench.py's single headline line.  Every
timing is host-synced via a scalar checksum (this backend's
block_until_ready is unreliable — see utils/profiling.py).

Configs covered (BASELINE.json):
  1. Hamming N=4096 @ 17-bit (vs float golden, RMS check)
  2. BH-4 N=1M @ W=17 generation throughput
  3. BH-7 N=64M @ W=32 (-180 dB) generation throughput  [= bench.py]
  4. Windowed Welch analyzer: BH-4 window, 1M-pt FFT frames
  5. SDR chain: channelizer + discriminator throughput
  6. BH-7 N=64M @ W=32 fast mode (outer-product generator, -180 dB floor
     held spectrally, tests/test_fastwin.py)
  7. Fused gen+FFT: 64M-pt windowed power spectrum in ONE dispatch —
     on-the-fly BH-7 window (fast mode) * on-device signal -> rfft -> |.|^2
     (the reference's end application: window core feeding an FFT front-end,
     SURVEY.md §1 L3, with no stored window table, README.md:2-3)
  8. BH-7 N=64M @ W=32 under the RTL (VHDL) rounding contract — the actual
     hardware contract of src/bh_win_3term.vhd:257-306, bit-exact on int32
     lanes (kernels/pallas/window_kernel.py:window_values_rtl)
  9. cordic_dds48 engine @ W=32: the reference's max-precision flavor
     (48-bit internal state, src/cordic_dds48.vhd:234-258) as radix-2^24
     limb pairs — single-harmonic sin/cos at 64M phases, bit-exact vs the
     native oracle
 10. cordic_dds_scaled engine @ W=24: the area-compromise flavor
     (SEL_SIZE empirical width table, src/cordic_dds_scaled.vhd:100-143) —
     single-harmonic sin/cos at 64M phases, bit-exact vs the native oracle
  11. BH-7 N=64M @ W=32 fast mode measured WITHOUT the harness wall: the
     outer-product generator with the checksum reduction inside a Pallas
     kernel (kernels/pallas/outerwin_kernel.py) — one int32 partial per
     grid step, the window never touches HBM
 12. BH-7 N=64M native float32 generation (kernels/floatwin.py — the
     TPU-only capability for float consumers; ~ -163 dB floor, jnp harness)
 13. Same, with the Pallas in-kernel f32 reduction (no harness wall)
 14. BH-7 N=64M compensated-f32 generation (kernels/compwin.py — the FULL
     -180 dB contract for float consumers via (hi, lo) pairs; jnp harness)
 15. Same, with the Pallas in-kernel reduction (raw-pair deployment shape,
     both accumulator tiles read by the reduction)
 16. taylor_sincos raw engine W=16 / LUT=10 (tay1 DSP48-MACC regime,
     src/taylor_sincos.vhd:169-221) — 64M phases, bit-exact vs the native
     oracle
 17. taylor_sincos raw engine W=32 / LUT=12 (the W>=19 wide-multiplier
     regime, src/tay1_order.vhd:506-599)
 18. TAYLOR-source 3-term window (blackman) @ W=32, 64M points — the
     reference's designated fast path feeding a window core
     (src/bh_win_3term.vhd:221-233 frequency-doubling instantiation)
 19. cordic_atan2 raw vectoring engine @ W=20 — 64M (y, x) pairs, the last
     of the four rotation/vectoring engines (src/cordic_atan2.vhd:146-219)
 20. atan2_fixed @ W=24 (standard-convention variant, same datapath)

Every line carries ``regime_ref``: the throughput (Msamp/s) of ONE fixed
reference kernel (the config-11 int in-kernel-reduce checksum) measured
FIRST in this process.  The chip shows process-level slow/fast regimes
(whole sweeps scale ~0.7-1.0x between processes, BENCH_NOTES.md): dividing
any line by its regime_ref (vs the regime_ref of another sweep) makes
cross-process comparisons self-interpreting.  The opening measurement can
run up to ~2.4x cold (observed: 5299 opening vs 12656 when config 11
re-times the same kernel warm), so the same kernel is re-timed at the END
and emitted as ``regime_ref_end`` — the (start, end) pair brackets the
process's regime over the sweep.
"""

import json

import numpy as np

_REGIME = {}


def _sync_time(fn, reps=3):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, reps=reps)


def _emit(out):
    out[-1].update(_REGIME)
    print(json.dumps(out[-1]), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import window_values
    from blackman_harris_win_tpu.kernels.window import make_window
    from blackman_harris_win_tpu.pipeline.spectral import welch_power, window_scale
    from blackman_harris_win_tpu.utils.profiling import (
        cordic_window_int_ops,
        outer_window_int_ops,
        roofline_fields,
    )
    from blackman_harris_win_tpu.windows import catalog

    out = []

    # --- regime self-calibration (VERDICT r3 item 6): one fixed reference
    #     kernel, timed FIRST — the config-11 int in-kernel-reduce checksum
    #     (in-process spread < 0.2%, BENCH_NOTES.md round-3 probes).  Every
    #     subsequent line carries this as "regime_ref". ---
    from blackman_harris_win_tpu.kernels.pallas.outerwin_kernel import (
        make_checksum_fn,
    )

    pw6 = 26
    spec6 = WindowSpec(pw6, 32, overflow="wrap")
    q6 = catalog.get("bh7").quantized(32)
    m6 = 11
    fn11 = make_checksum_fn(q6, spec6, m=m6, rows=256)
    reps_ref = 8

    @jax.jit
    def gen_regime(seed):
        def body(acc, i):
            return acc + fn11(i), None
        s_, _ = jax.lax.scan(body, seed, jnp.arange(reps_ref, dtype=jnp.int32))
        return s_

    t = _sync_time(lambda: gen_regime(jnp.int32(0)))
    ref_msps = reps_ref * (1 << pw6) / t / 1e6
    _REGIME["regime_ref"] = round(ref_msps, 1)
    out.append({"metric": "regime_ref_int_inkernel_reduce",
                "value": round(ref_msps, 1), "unit": "Msamples/s",
                "note": "fixed calibration kernel; divide any line by this "
                        "to compare across process regimes"})
    _emit(out)

    # --- config 1: Hamming 4096 @17b, RMS vs float golden ---
    spec1 = WindowSpec(12, 17, overflow="saturate")
    win = np.asarray(make_window("hamming", spec1), np.float64)
    gold = catalog.golden_quantized_window("hamming", np.arange(4096), 4096, 17)
    rms = float(np.sqrt(np.sum((win - gold) ** 2)) / 4096)
    out.append({"metric": "hamming_4096_w17_rms_vs_float", "value": round(rms, 4),
                "unit": "LSB", "pass": rms < 10})
    _emit(out)

    # --- config 2: BH-4 @ W=17 gen (1M-window config, 64 windows per
    #     dispatch to amortize the ~32 ms tunnel round-trip) ---
    spec2 = WindowSpec(20, 17, overflow="wrap")
    q2 = catalog.get("bh4").quantized(17)
    L2 = 1 << 20
    REP2 = 64

    @jax.jit
    def gen_bh4(_):
        def body(acc, i):
            n = jnp.arange(L2, dtype=jnp.int32)
            return acc + jnp.sum(window_values(n + i, q2, spec2)), None
        s_, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(REP2, dtype=jnp.int32))
        return s_

    t = _sync_time(lambda: gen_bh4(0))
    v2 = REP2 * L2 / t / 1e6
    out.append({"metric": "bh4_1M_w17_gen", "value": round(v2, 1),
                "unit": "Msamples/s", "vs_fpga_400": round(v2 / 400, 2),
                **roofline_fields(
                    t, int_ops=cordic_window_int_ops(REP2 * L2, 4, 17, False))})
    _emit(out)

    # --- config 3 is bench.py's headline (64M BH-7) ---

    # --- config 4: Welch analyzer, BH-4 window, 1M-pt frames ---
    nfft, hop = 1 << 20, 1 << 19
    spec4 = WindowSpec(20, 17, overflow="saturate")
    # 128 frames: at 16 frames the ~25-30 ms dispatch floor dominates
    # (size sweep in BENCH_NOTES.md: 16/64/128 frames -> 467/1036/1312)
    T = 128 * nfft
    # synthesize the input ON DEVICE (host->device transfers crawl through
    # the tunnel at ~0.1 MB/s)
    x = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (T,), jnp.float32)
    )()
    sc = window_scale(spec4, catalog.get("bh4").shift)

    @jax.jit
    def analyzer(xv):
        wq = window_values(jnp.arange(nfft, dtype=jnp.int32), q2, spec4)
        w = wq.astype(jnp.float32) * jnp.float32(sc)
        return jnp.sum(welch_power(xv, w, nfft, hop))

    t = _sync_time(lambda: analyzer(x))
    # HBM lower-bound model (BENCH_NOTES.md): x read + 2x-overlap frames
    # write+read (f32) + one complex64 pass inside the FFT.
    out.append({"metric": "welch_bh4_1Mfft", "value": round(T / t / 1e6, 1),
                "unit": "Msamples/s_in",
                **roofline_fields(t, bytes_moved=52 * T)})
    _emit(out)

    # --- config 4b: the same analyzer with the round-5 FFT-wall work —
    #     amortized (4 reps in-dispatch; the ~27 ms tunnel dispatch floor
    #     is floor-scale for this payload) and both FFT backends
    #     interleaved: XLA rfft vs the MXU matmul-DFT bypass
    #     (fft_mode="mxu": packed frame pairs + mixed-radix (128,128,64)
    #     matmul stages; XLA's own FFT measures ~3% of the single-pass
    #     HBM bound at every shape, BENCH_NOTES round 5) ---
    def make_amort(mode):
        @jax.jit
        def run(xv):
            def body(acc, i):
                xr = jnp.roll(xv, i)  # defeat CSE across reps
                wq = window_values(
                    jnp.arange(nfft, dtype=jnp.int32), q2, spec4)
                w = wq.astype(jnp.float32) * jnp.float32(sc)
                return acc + jnp.sum(welch_power(xr, w, nfft, hop, mode)), None

            s_, _ = jax.lax.scan(body, jnp.float32(0),
                                 jnp.arange(4, dtype=jnp.int32))
            return s_

        return run

    an_r, an_m = make_amort("rfft"), make_amort("mxu")
    # agreement gate (identical math; f32 rounding differs)
    vr, vm = float(an_r(x)), float(an_m(x))
    assert abs(vr - vm) / abs(vr) < 1e-5, (vr, vm)
    ts_r, ts_m = [], []
    for _ in range(3):  # interleaved
        ts_r.append(_sync_time(lambda: an_r(x)) / 4)
        ts_m.append(_sync_time(lambda: an_m(x)) / 4)
    tr, tm = float(np.median(ts_r)), float(np.median(ts_m))
    out.append({"metric": "welch_bh4_1Mfft_amortized_rfft",
                "value": round(T / tr / 1e6, 1), "unit": "Msamples/s_in"})
    _emit(out)
    out.append({"metric": "welch_bh4_1Mfft_amortized_mxu",
                "value": round(T / tm / 1e6, 1), "unit": "Msamples/s_in",
                "speedup_vs_rfft": round(tr / tm, 3)})
    _emit(out)

    # --- config 5: SDR chain throughput (16-ch channelizer + discriminator) ---
    from blackman_harris_win_tpu.pipeline.channelizer import design_prototype
    from blackman_harris_win_tpu.pipeline.sdr import sdr_chain

    C, tpb = 16, 8
    proto = design_prototype(C, tpb)
    # 64M-sample input: below ~16M the ~25-30 ms tunnel dispatch floor
    # dominates and the bench measures latency, not the chain (stage probe
    # in BENCH_NOTES.md: every stage of a 2M-sample run costs ~25 ms flat)
    Ts = C * (1 << 22)
    xs = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(1), (Ts,), jnp.float32)
    )()

    @jax.jit
    def chain(v):
        return jnp.sum(sdr_chain(v, proto, C, angle_width=20))

    t = _sync_time(lambda: chain(xs))
    out.append({"metric": "sdr_chain_16ch", "value": round(Ts / t / 1e6, 1),
                "unit": "Msamples/s_in"})
    _emit(out)

    # --- config 6: BH-7 64M @ W=32 fast mode (outer-product generator) ---
    #     (pw6/spec6/q6/m6 defined with the regime-calibration kernel above)
    from blackman_harris_win_tpu.kernels.outerwin import window_block_outer

    rows6 = 1 << 12          # block = rows * 2^m6 = 8M samples (+18% vs 4M,
    #                          bench_fastmode_probe.py variant D)
    blk6 = rows6 << m6
    nb6 = (1 << pw6) // blk6
    reps6 = 8                # windows per dispatch (amortize tunnel latency)

    @jax.jit
    def gen_outer(seed):
        def body(acc, i):
            wv = window_block_outer((i & (nb6 - 1)) * blk6, rows6, q6, spec6, m=m6)
            return acc + jnp.sum(wv), None
        s_, _ = jax.lax.scan(
            body, seed, jnp.arange(reps6 * nb6, dtype=jnp.int32))
        return s_

    t = _sync_time(lambda: gen_outer(jnp.int32(0)))
    v6 = reps6 * (1 << pw6) / t / 1e6
    out.append({"metric": "bh7_w32_64M_gen_fastmode", "value": round(v6, 1),
                "unit": "Msamples/s", "vs_fpga_400": round(v6 / 400, 2),
                **roofline_fields(
                    t, int_ops=outer_window_int_ops(reps6 * (1 << pw6), 7))})
    _emit(out)

    # --- config 7: fused gen+FFT — 64M-pt windowed power spectrum, one
    #     dispatch: on-the-fly window gen * on-device signal -> rfft ---
    n7 = 1 << pw6
    x7 = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(2), (n7,), jnp.float32)
    )()
    sc7 = window_scale(spec6, catalog.get("bh7").shift)

    @jax.jit
    def fused_spectrum(xv):
        wq = window_block_outer(0, n7 >> m6, q6, spec6, m=m6)
        xw = xv * (wq.astype(jnp.float32) * jnp.float32(sc7))
        p = jnp.abs(jnp.fft.rfft(xw)) ** 2
        return jnp.sum(p)

    t = _sync_time(lambda: fused_spectrum(x7))
    # HBM lower-bound model (BENCH_NOTES.md): x read + windowed f32 rw +
    # one complex64 pass inside the 64M rFFT.
    out.append({"metric": "fused_gen_fft_64M", "value": round(n7 / t / 1e6, 1),
                "unit": "Msamples/s_in",
                **roofline_fields(t, bytes_moved=28 * n7)})
    _emit(out)

    # --- config 7b: the same fused spectrum amortized (4 reps
    #     in-dispatch; the single-dispatch line above is ~50%% dispatch
    #     floor).  Single huge frames keep XLA's rfft: every alternative
    #     probed loses (BENCH_NOTES round 5 -- monolithic cfft 34x,
    #     mxu-split 43x on minor-axis strided slices). ---
    @jax.jit
    def fused_amort(xv):
        def body(acc, i):
            xr = jnp.roll(xv, i)
            wq = window_block_outer(0, n7 >> m6, q6, spec6, m=m6)
            xw_ = xr * (wq.astype(jnp.float32) * jnp.float32(sc7))
            return acc + jnp.sum(jnp.abs(jnp.fft.rfft(xw_)) ** 2), None

        s_, _ = jax.lax.scan(body, jnp.float32(0),
                             jnp.arange(4, dtype=jnp.int32))
        return s_

    t = _sync_time(lambda: fused_amort(x7)) / 4
    out.append({"metric": "fused_gen_fft_64M_amortized",
                "value": round(n7 / t / 1e6, 1), "unit": "Msamples/s_in"})
    _emit(out)

    # --- config 8: BH-7 64M @ W=32, RTL (VHDL) rounding contract ---
    from blackman_harris_win_tpu.model import native

    spec8 = WindowSpec(pw6, 32, rounding="rtl", overflow="wrap")
    q8 = catalog.get("bh7").quantized(32)
    blk8 = 1 << 22
    nb8 = (1 << pw6) // blk8
    reps8 = 2

    @jax.jit
    def gen_rtl(seed):
        def body(acc, i):
            n = (i & (nb8 - 1)) * blk8 + jnp.arange(blk8, dtype=jnp.int32)
            return acc + jnp.sum(window_values(n, q8, spec8)), None
        s_, _ = jax.lax.scan(
            body, seed, jnp.arange(reps8 * nb8, dtype=jnp.int32))
        return s_

    # in-bench golden gate: one 2048-sample block vs the native RTL oracle
    blk_chk = np.asarray(
        jax.jit(lambda: window_values(
            (1 << 20) + jnp.arange(2048, dtype=jnp.int32), q8, spec8))()
    ).astype(np.int64)
    want = native.win_rtl((1 << 20) + np.arange(2048, dtype=np.int64),
                          q8, pw6, 32, 1)
    assert (blk_chk == want).all(), "RTL golden mismatch"

    t = _sync_time(lambda: gen_rtl(jnp.int32(0)))
    v8 = reps8 * (1 << pw6) / t / 1e6
    out.append({"metric": "bh7_w32_64M_gen_rtl_contract", "value": round(v8, 1),
                "unit": "Msamples/s", "vs_fpga_400": round(v8 / 400, 2),
                **roofline_fields(
                    t, int_ops=cordic_window_int_ops(
                        reps8 * (1 << pw6), 7, 32, True))})
    _emit(out)

    # --- configs 9/10: the dds48 (max-precision) and scaled (area-
    #     compromise) rotation engines, single-harmonic sin/cos at 64M ---
    from blackman_harris_win_tpu.core.luts import scaled_internal_width
    from blackman_harris_win_tpu.kernels.pallas.cordic_wide import (
        cordic_dds48_i32,
        cordic_scaled_i32,
    )

    blk9 = 1 << 22
    nb9 = (1 << pw6) // blk9
    reps9 = 2
    for metric, eng_fn, oracle, w_eng, size in (
        ("cordic_dds48_w32_64M", cordic_dds48_i32, native.cordic_dds48,
         32, 48),
        ("cordic_scaled_w24_64M", cordic_scaled_i32, native.cordic_scaled,
         24, scaled_internal_width(24)),
    ):
        # in-bench golden gate vs the native oracle (quadrant-seam block)
        seam = (1 << pw6) // 4 - 1024 + np.arange(2048, dtype=np.int64)
        cj, sj = jax.jit(lambda s=seam, f=eng_fn, w=w_eng: f(
            jnp.asarray(s, jnp.int32), pw6, w))()
        cn, sn = oracle(seam, pw6, w_eng)
        assert (np.asarray(cj).astype(np.int64) == cn).all(), metric
        assert (np.asarray(sj).astype(np.int64) == sn).all(), metric

        @jax.jit
        def gen_eng(seed, f=eng_fn, w=w_eng):
            def body(acc, i):
                n = (i & (nb9 - 1)) * blk9 + jnp.arange(blk9, dtype=jnp.int32)
                c, s = f(n, pw6, w)
                return acc + jnp.sum(c) + jnp.sum(s), None
            s_, _ = jax.lax.scan(
                body, seed, jnp.arange(reps9 * nb9, dtype=jnp.int32))
            return s_

        t = _sync_time(lambda: gen_eng(jnp.int32(0)))
        v = reps9 * (1 << pw6) / t / 1e6
        # op model: limb-pair iterations (22 ops) when any state width
        # exceeds an int32 lane, single-lane (8 ops) otherwise; W x/y
        # iterations + W-1 z iterations ~ the wide window model's per-
        # harmonic cost with K-1 = 1 and no product stage.
        per_iter = 22 if size > 32 else 8
        ops = reps9 * (1 << pw6) * w_eng * per_iter
        out.append({"metric": metric, "value": round(v, 1),
                    "unit": "Msamples/s", "vs_fpga_400": round(v / 400, 2),
                    "internal_width": size,
                    **roofline_fields(t, int_ops=ops)})
        _emit(out)

    # --- config 11: fast mode WITHOUT the harness wall (in-kernel reduce;
    #     fn11 is the already-compiled regime-calibration kernel) ---
    # golden gate: pallas in-kernel checksum == the jnp scan checksum
    @jax.jit
    def jnp_checksum():
        def body(acc, i):
            wv = window_block_outer(i * blk6, rows6, q6, spec6, m=m6)
            return acc + jnp.sum(wv), None
        s_, _ = jax.lax.scan(body, jnp.int32(0),
                             jnp.arange(nb6, dtype=jnp.int32))
        return s_

    got11 = int(jax.jit(fn11)(jnp.int32(0)))
    assert got11 == int(jnp_checksum()), "pallas checksum mismatch"

    reps11 = 16

    @jax.jit
    def gen_pallas(seed):
        def body(acc, i):
            return acc + fn11(i), None
        s_, _ = jax.lax.scan(body, seed, jnp.arange(reps11, dtype=jnp.int32))
        return s_

    t = _sync_time(lambda: gen_pallas(jnp.int32(0)))
    v11 = reps11 * (1 << pw6) / t / 1e6
    out.append({"metric": "bh7_w32_64M_gen_fastmode_inkernel_reduce",
                "value": round(v11, 1), "unit": "Msamples/s",
                "vs_fpga_400": round(v11 / 400, 2),
                "accounting": "window never in HBM; one int32/grid-step",
                **roofline_fields(
                    t, int_ops=outer_window_int_ops(reps11 * (1 << pw6), 7))})
    _emit(out)

    # --- configs 12/13: native float32 window generation (the TPU-only
    #     capability for float consumers, kernels/floatwin.py): jnp scan
    #     harness + Pallas in-kernel reduction ---
    from blackman_harris_win_tpu.kernels.floatwin import (
        float_window_block,
        float_window_flops,
    )
    from blackman_harris_win_tpu.kernels.pallas.outerwin_kernel import (
        make_checksum_fn_f32,
    )
    from blackman_harris_win_tpu.windows.catalog import float_window_value

    # golden gate: a 2048-sample block vs the f64 catalog golden
    chk = np.arange(2048, dtype=np.int64) + (1 << 25)
    got_f = np.asarray(jax.jit(lambda: float_window_block(
        jnp.int32(1 << 25), 1, "bh7", pw6))()).astype(np.float64)
    want_f = float_window_value("bh7", chk, 1 << pw6)
    assert np.max(np.abs(got_f - want_f)) < 1.5e-6, "f32 golden gate"

    rows12 = 1 << 12
    blk12 = rows12 << m6
    nb12 = (1 << pw6) // blk12
    reps12 = 16

    @jax.jit
    def gen_f32(seed):
        def body(acc, i):
            wv = float_window_block(
                (i & (nb12 - 1)) * blk12, rows12, "bh7", pw6, m=m6)
            return acc + jnp.sum(wv), None
        s_, _ = jax.lax.scan(
            body, seed, jnp.arange(reps12 * nb12, dtype=jnp.int32))
        return s_

    t = _sync_time(lambda: gen_f32(jnp.float32(0)))
    v12 = reps12 * (1 << pw6) / t / 1e6
    out.append({"metric": "bh7_64M_gen_float32_fastmode", "value": round(v12, 1),
                "unit": "Msamples/s", "vs_fpga_400": round(v12 / 400, 2),
                **roofline_fields(
                    t, int_ops=float_window_flops(reps12 * (1 << pw6), 7))})
    _emit(out)

    # rows=512 fits the f32 kernel's VMEM (fewer temporaries than the int
    # limb path, which OOMs there) and gains ~5% over 256; 1024 OOMs.
    fn13 = make_checksum_fn_f32("bh7", pw6, m=m6, rows=512)

    # in-bench correctness gate (ADVICE r3): the compiled kernel's one-
    # period sum vs the jnp scan sum (f32 accumulation order differs ->
    # relative tolerance)
    @jax.jit
    def jnp_f32_checksum():
        def body(acc, i):
            wv = float_window_block(i * blk12, rows12, "bh7", pw6, m=m6)
            return acc + jnp.sum(wv), None
        s_, _ = jax.lax.scan(body, jnp.float32(0),
                             jnp.arange(nb12, dtype=jnp.int32))
        return s_

    got13 = float(jax.jit(fn13)(jnp.int32(0)))
    want13 = float(jnp_f32_checksum())
    assert abs(got13 - want13) < 1e-3 * max(1.0, abs(want13)), \
        f"f32 pallas checksum gate: {got13} vs {want13}"

    @jax.jit
    def gen_f32_pl(seed):
        def body(acc, i):
            return acc + fn13(i), None
        s_, _ = jax.lax.scan(body, seed, jnp.arange(reps12, dtype=jnp.int32))
        return s_

    t = _sync_time(lambda: gen_f32_pl(jnp.float32(0)))
    v13 = reps12 * (1 << pw6) / t / 1e6
    out.append({"metric": "bh7_64M_gen_float32_inkernel_reduce",
                "value": round(v13, 1), "unit": "Msamples/s",
                "vs_fpga_400": round(v13 / 400, 2),
                "accounting": "window never in HBM; one f32/grid-step",
                **roofline_fields(
                    t, int_ops=float_window_flops(reps12 * (1 << pw6), 7))})
    _emit(out)

    # --- configs 14/15: compensated-f32 generation (kernels/compwin.py) —
    #     the FULL -180 dB BH-7 contract in the float regime via (hi, lo)
    #     pairs; jnp harness + the Pallas in-kernel reduction ---
    from blackman_harris_win_tpu.kernels.compwin import (
        comp_window_block,
        comp_window_flops,
    )
    from blackman_harris_win_tpu.kernels.pallas.outerwin_kernel import (
        make_checksum_fn_comp,
    )

    # golden gate: a 2048-sample pair block vs the f64 catalog golden
    hi_g, lo_g = jax.jit(lambda: comp_window_block(
        jnp.int32(1 << 25), 1, "bh7", pw6))()
    pair = np.asarray(hi_g, np.float64) + np.asarray(lo_g, np.float64)
    assert np.max(np.abs(pair - want_f)) < 5e-9, "comp golden gate"

    @jax.jit
    def gen_comp(seed):
        def body(acc, i):
            hi, lo = comp_window_block(
                (i & (nb12 - 1)) * blk12, rows12, "bh7", pw6, m=m6)
            return acc + jnp.sum(hi) + jnp.sum(lo), None
        s_, _ = jax.lax.scan(
            body, seed, jnp.arange(reps12 * nb12, dtype=jnp.int32))
        return s_

    flops14 = comp_window_flops(reps12 * (1 << pw6), "bh7")
    t = _sync_time(lambda: gen_comp(jnp.float32(0)))
    v14 = reps12 * (1 << pw6) / t / 1e6
    out.append({"metric": "bh7_64M_gen_compf32_fastmode", "value": round(v14, 1),
                "unit": "Msamples/s", "vs_fpga_400": round(v14 / 400, 2),
                "floor_db": -180.4,
                **roofline_fields(t, int_ops=flops14)})
    _emit(out)

    fn15 = make_checksum_fn_comp("bh7", pw6, m=m6, rows=256)

    @jax.jit
    def jnp_comp_checksum():
        def body(acc, i):
            hi, lo = comp_window_block(i * blk12, rows12, "bh7", pw6, m=m6)
            return acc + jnp.sum(hi) + jnp.sum(lo), None
        s_, _ = jax.lax.scan(body, jnp.float32(0),
                             jnp.arange(nb12, dtype=jnp.int32))
        return s_

    got15 = float(jax.jit(fn15)(jnp.int32(0)))
    want15 = float(jnp_comp_checksum())
    assert abs(got15 - want15) < 1e-3 * max(1.0, abs(want15)), \
        f"comp pallas checksum gate: {got15} vs {want15}"

    @jax.jit
    def gen_comp_pl(seed):
        def body(acc, i):
            return acc + fn15(i), None
        s_, _ = jax.lax.scan(body, seed, jnp.arange(reps12, dtype=jnp.int32))
        return s_

    t = _sync_time(lambda: gen_comp_pl(jnp.float32(0)))
    v15 = reps12 * (1 << pw6) / t / 1e6
    out.append({"metric": "bh7_64M_gen_compf32_inkernel_reduce",
                "value": round(v15, 1), "unit": "Msamples/s",
                "vs_fpga_400": round(v15 / 400, 2),
                "accounting": "window never in HBM; one f32/grid-step",
                **roofline_fields(t, int_ops=flops14)})
    _emit(out)

    # --- configs 16/17: taylor_sincos raw engine — the reference's
    #     designated fast path (src/taylor_sincos.vhd:25-29: 5-11 taps vs
    #     CORDIC's W+2).  The GATHER-FREE block kernel
    #     (kernels/taylor.py:taylor_sincos_block): ROM rows by slice, the
    #     tay1 correction as rank-1 broadcasts.  (The indexed rom[addr]
    #     gather form measured 295 Msamp/s at 64M — below the FPGA's 400 —
    #     XLA-gather-bound; see BENCH_NOTES round 4.) ---
    from blackman_harris_win_tpu.kernels.taylor import (
        taylor_sincos,
        taylor_sincos_block,
        taylor_window_block,
    )

    blk16 = 1 << 22
    nb16 = (1 << pw6) // blk16
    reps16 = 8
    for metric, w_t, ls_t, opsps in (
        ("taylor_sincos_w16_lut10_64M", 16, 10, 14),
        ("taylor_sincos_w32_lut12_64M", 32, 12, 24),
    ):
        # gate: an R-aligned block spanning the N/4 quadrant seam vs the
        # native oracle, through BOTH the block kernel and the indexed form
        r_t = 1 << (pw6 - ls_t - 2)
        seam0 = (1 << pw6) // 4 - 2 * r_t
        cnt_t = 4 * r_t
        seam = seam0 + np.arange(cnt_t, dtype=np.int64)
        cj, sj = jax.jit(lambda w=w_t, ls=ls_t, c=cnt_t: taylor_sincos_block(
            jnp.int32(seam0), c, pw6, w, ls))()
        cn, sn = native.taylor_sincos(seam, pw6, w_t, ls_t)
        assert (np.asarray(cj).astype(np.int64) == cn).all(), metric
        assert (np.asarray(sj).astype(np.int64) == sn).all(), metric
        ci, si = jax.jit(lambda w=w_t, ls=ls_t: taylor_sincos(
            jnp.asarray(seam[:4096], jnp.int32), pw6, w, ls))()
        assert (np.asarray(ci).astype(np.int64) == cn[:4096]).all(), metric

        @jax.jit
        def gen_tay(seed, w=w_t, ls=ls_t):
            def body(acc, i):
                n0 = (i & (nb16 - 1)) * blk16
                c, s = taylor_sincos_block(n0, blk16, pw6, w, ls)
                return acc + jnp.sum(c) + jnp.sum(s), None
            s_, _ = jax.lax.scan(
                body, seed, jnp.arange(reps16 * nb16, dtype=jnp.int32))
            return s_

        t = _sync_time(lambda: gen_tay(jnp.int32(0)))
        v = reps16 * (1 << pw6) / t / 1e6
        # rough op model: 2 tay1 MACC lanes (multiply-shift + add per
        # output, tay1_order.vhd:180-599) + quadrant folds
        out.append({"metric": metric, "value": round(v, 1),
                    "unit": "Msamples/s", "vs_fpga_400": round(v / 400, 2),
                    **roofline_fields(
                        t, int_ops=reps16 * (1 << pw6) * opsps)})
        _emit(out)

    # --- config 18: TAYLOR-source 3-term window @ W=32, 64M points
    #     (gather-free taylor_window_block) ---
    q18 = catalog.get("blackman").quantized(32)
    spec18 = WindowSpec(pw6, 32, sin_type="taylor", lut_size=12,
                        rounding="hls", overflow="wrap")

    # gate: replicate the HLS w=32 TAYLOR accumulation with the native
    # taylor oracle (full-scale cos, product >> 31, int32 wrap)
    r1_18 = 1 << (pw6 - 12 - 2)
    seam0 = ((1 << pw6) // 2 - 4 * r1_18)
    seam = seam0 + np.arange(8 * r1_18, dtype=np.int64)
    wj = np.asarray(jax.jit(lambda: taylor_window_block(
        jnp.int32(seam0), 8 * r1_18, q18, spec18))()).astype(np.int64)
    acc = np.full(seam.shape, q18[0], np.int64)
    for k in (1, 2):
        pwk = pw6 - (k - 1)
        cn, _ = native.taylor_sincos(seam & ((1 << pwk) - 1), pwk, 32, 12)
        m = (q18[k] * cn) >> 31
        acc = acc - m if k % 2 == 1 else acc + m
    want18 = ((acc + (1 << 31)) % (1 << 32)) - (1 << 31)
    assert (wj == want18).all(), "taylor window gate"

    @jax.jit
    def gen_taywin(seed):
        def body(acc_, i):
            n0 = (i & (nb16 - 1)) * blk16
            return acc_ + jnp.sum(taylor_window_block(
                n0, blk16, q18, spec18)), None
        s_, _ = jax.lax.scan(
            body, seed, jnp.arange(reps16 * nb16, dtype=jnp.int32))
        return s_

    t = _sync_time(lambda: gen_taywin(jnp.int32(0)))
    v18 = reps16 * (1 << pw6) / t / 1e6
    out.append({"metric": "blackman_w32_64M_gen_taylor_source",
                "value": round(v18, 1), "unit": "Msamples/s",
                "vs_fpga_400": round(v18 / 400, 2),
                **roofline_fields(
                    t, int_ops=reps16 * (1 << pw6) * (2 * 24 + 8))})
    _emit(out)

    # --- configs 19/20: the vectoring-mode engine (cordic_atan2) and the
    #     corrected-convention atan2_fixed — 64M (y, x) pairs.  Inputs are
    #     synthesized in-register (multiplicative-hash ints: 2 ops) so the
    #     measurement is the engine, not HBM. ---
    from blackman_harris_win_tpu.kernels.cordic import atan2_fixed, cordic_atan2

    def _wrap32(v):
        v = v & 0xFFFFFFFF
        return np.where(v >= (1 << 31), v - (1 << 32), v)

    def _hash_np(n, k, add, sw):
        """Host replica of hash_pair's int32 lane math (int64 carrier)."""
        v = _wrap32(n * k + add)
        return _wrap32(v << sw) >> sw

    for metric, fn_a, iw_a, aw_a in (
        ("cordic_atan2_w20_64M", cordic_atan2, 20, 20),
        ("atan2_fixed_w24_64M", atan2_fixed, 24, 24),
    ):
        shift_in = 32 - iw_a

        def hash_pair(n, sw=shift_in):
            y = ((n * jnp.int32(-1640531527)) << sw) >> sw  # Knuth hash
            x = ((n * jnp.int32(-2048144789) + jnp.int32(7)) << sw) >> sw
            return y, x

        # gate vs the native oracle (reference convention) / the float
        # angle (corrected convention) on a deterministic block
        nb_blk = np.arange(2048, dtype=np.int64)
        yh = _hash_np(nb_blk, -1640531527, 0, shift_in)
        xh = _hash_np(nb_blk, -2048144789, 7, shift_in)
        aj = np.asarray(jax.jit(lambda f=fn_a, iw=iw_a, aw=aw_a: f(
            jnp.asarray(yh, jnp.int32), jnp.asarray(xh, jnp.int32),
            iw, aw))()).astype(np.int64)
        if fn_a is cordic_atan2:
            an = native.cordic_atan2(yh, xh, iw_a, aw_a)
            assert (aj == an).all(), metric
        else:
            # float-angle acceptance on in-contract radii: >= 2^(iw-4)
            # (smaller is input-quantization-limited) and <= 2^(iw-1) (the
            # K*r gain growth must fit the aw+1-bit state — the reference
            # feeds quadrature pairs within full scale)
            r2 = yh.astype(np.float64) ** 2 + xh.astype(np.float64) ** 2
            sel = (r2 >= float(1 << (2 * (iw_a - 4)))) & \
                  (r2 <= float(1 << (2 * (iw_a - 1))))
            ideal = np.round(
                np.arctan2(yh[sel].astype(np.float64),
                           xh[sel].astype(np.float64))
                * (1 << (aw_a - 1)) / np.pi)
            derr = np.abs(aj[sel] - ideal)
            derr = np.minimum(derr, (1 << aw_a) - derr)  # angle wrap
            assert derr.mean() < 8, metric

        @jax.jit
        def gen_atan(seed, f=fn_a, iw=iw_a, aw=aw_a):
            def body(acc_, i):
                n = i * blk16 + jnp.arange(blk16, dtype=jnp.int32)
                y, x = hash_pair(n)
                return acc_ + jnp.sum(f(y, x, iw, aw)), None
            s_, _ = jax.lax.scan(
                body, seed, jnp.arange(reps16 * nb16, dtype=jnp.int32))
            return s_

        t = _sync_time(lambda: gen_atan(jnp.int32(0)))
        v = reps16 * (1 << pw6) / t / 1e6
        # op model: aw-1 vectoring iterations x ~8 single-limb ops
        out.append({"metric": metric, "value": round(v, 1),
                    "unit": "Mpairs/s", "vs_fpga_400": round(v / 400, 2),
                    **roofline_fields(
                        t, int_ops=reps16 * (1 << pw6) * (aw_a - 1) * 8)})
        _emit(out)

    # --- config 21: DDC (round 5) — dds48 NCO + integer I/Q mixer +
    #     decimating FIR, 64M input samples in one dispatch (the CORDIC
    #     in its titular DDS role, src/cordic_dds48.vhd:9-14) ---
    from blackman_harris_win_tpu.pipeline.ddc import MIX_IN_BITS, ddc
    from blackman_harris_win_tpu.pipeline.fir import design_lowpass

    t21 = 1 << 26
    dec21 = 4
    h21 = design_lowpass(64, 0.8 / dec21)
    x21 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(21), (t21,), jnp.float32))()

    @jax.jit
    def ddc_sum(xv):
        bb = ddc(xv, 1 / 8, dec21, taps=h21)
        return jnp.sum(bb * bb)

    # correctness gate: a tone at fc+df lands at df in baseband
    fc_t, df_t = 1 / 8, 1 / 256
    xt = np.cos(2 * np.pi * (fc_t + df_t)
                * np.arange(16384)).astype(np.float32)
    bb_t = np.asarray(jax.jit(
        lambda v: ddc(v, fc_t, dec21, taps=h21))(jnp.asarray(xt)))
    zt = (bb_t[0].astype(np.float64) + 1j * bb_t[1])[16:-16]
    f_meas = float(np.mean(np.diff(np.unwrap(np.angle(zt))))
                   / (2 * np.pi * dec21))
    assert abs(f_meas - df_t) < 1e-4, f_meas

    t = _sync_time(lambda: ddc_sum(x21))
    v21 = t21 / t / 1e6
    # op model: dds48 two-limb (48-bit state, 16 xy iters x ~22 ops) + 2
    # integer mixer products + the FIR (MXU, not in the VPU count)
    out.append({"metric": "ddc_dds48_64M_decim4", "value": round(v21, 1),
                "unit": "Msamples/s_in", "vs_fpga_400": round(v21 / 400, 2),
                "mix_in_bits": MIX_IN_BITS,
                **roofline_fields(
                    t, int_ops=t21 * (16 * 22 + 2 + 4))})
    _emit(out)

    # --- closing regime calibration: same kernel as the opening one ---
    t = _sync_time(lambda: gen_regime(jnp.int32(0)))
    ref_end = reps_ref * (1 << pw6) / t / 1e6
    out.append({"metric": "regime_ref_end", "value": round(ref_end, 1),
                "unit": "Msamples/s",
                "note": "closing re-time of the opening calibration kernel; "
                        "(regime_ref, regime_ref_end) brackets the "
                        "process's regime over the sweep"})
    _emit(out)


if __name__ == "__main__":
    main()
