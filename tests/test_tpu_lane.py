"""Opt-in real-TPU kernel lane (round-1 VERDICT item 5).

The default suite runs on the CPU backend (tests/conftest.py forces it; the
axon TPU tunnel is single-client).  This file validates the *compiled* wide
Pallas kernel and the int32-lane datapaths on the actual chip against the
golden models — catching kernel regressions before the bench flow.  Run
standalone (never concurrently with another TPU process):

    BHW_TPU_TEST=1 python -m pytest tests/test_tpu_lane.py -q

All tests here are skipped unless BHW_TPU_TEST=1.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("BHW_TPU_TEST") != "1",
    reason="opt-in real-TPU lane; run: BHW_TPU_TEST=1 pytest tests/test_tpu_lane.py",
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        pytest.skip("no TPU device visible")
    return dev


def test_wide_pallas_kernel_tile(tpu):
    """One compiled tile of the radix-4 two-limb kernel at the -180 dB
    64M config, spanning the first quadrant seam (every datapath bug so far
    surfaced at a quadrant boundary)."""
    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import (
        pallas_window_block,
    )
    from blackman_harris_win_tpu.model import golden
    from blackman_harris_win_tpu.windows import catalog

    pw, w = 26, 32
    spec = WindowSpec(pw, w, overflow="wrap")
    q = catalog.get("bh7").quantized(w)
    n0 = (1 << (pw - 2)) - 512  # tile spans the N/4 quadrant seam
    out = np.asarray(pallas_window_block(q, spec, n0, 1024, rows=8))
    for i in list(range(0, 1024, 13)) + list(range(500, 525)):
        assert int(out[i]) == golden.win_cosine_sum_hls(n0 + i, q, pw, w), i


def test_rtl_w32_window_on_chip(tpu):
    """The VHDL rounding contract at W=32 executes on the chip's int32 lanes
    (routed via kernels/window.py without x64) bit-exactly."""
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.window import window_samples
    from blackman_harris_win_tpu.model import golden
    from blackman_harris_win_tpu.windows import catalog

    pw, w = 12, 32
    spec = WindowSpec(pw, w, rounding="rtl", overflow="wrap")
    q = catalog.get("bh7").quantized(w)
    n = np.arange(0, 1 << pw, 29, dtype=np.int32)
    # MUST be jitted: eager execution compiles each unrolled int op
    # separately over the remote-compile tunnel (minutes-slow).
    fn = jax.jit(lambda nn: window_samples(nn, q, spec))
    got = np.asarray(fn(jnp.asarray(n)))
    for j in range(0, len(n), 5):
        want = golden.win_cosine_sum_rtl(
            int(n[j]), tuple(int(c) for c in q), pw, w
        )
        assert int(got[j]) == want, int(n[j])


@pytest.mark.parametrize("flavor,w", [("dds48", 24), ("scaled", 20), ("hls", 32)])
def test_wide_cordic_flavors_on_chip(tpu, flavor, w):
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import CordicSpec
    from blackman_harris_win_tpu.kernels import cordic as kc
    from blackman_harris_win_tpu.model import golden

    pw = 10
    ph = np.arange(0, 1 << pw, 3, dtype=np.int32)
    fn = jax.jit(lambda p: kc.cordic_sincos(p, CordicSpec(pw, w, flavor)))
    c, s = fn(jnp.asarray(ph))
    gfn = {
        "dds48": golden.cordic_dds48,
        "scaled": golden.cordic_scaled,
        "hls": golden.cordic_hls,
    }[flavor]
    for j in range(0, len(ph), 7):
        assert (int(c[j]), int(s[j])) == gfn(int(ph[j]), pw, w), int(ph[j])


def test_int_inkernel_reduce_checksum_on_chip(tpu):
    """The config-11/regime-ref kernel (generate + reduce in one Pallas
    kernel, window never in HBM): compiled checksum == the jnp scan
    checksum bit-for-bit (int32 wrap addition is associative)."""
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.outerwin import window_block_outer
    from blackman_harris_win_tpu.kernels.pallas.outerwin_kernel import (
        make_checksum_fn,
    )
    from blackman_harris_win_tpu.windows import catalog

    pw, m, rows = 18, 11, 16
    spec = WindowSpec(pw, 32, overflow="wrap")
    q = catalog.get("bh7").quantized(32)
    fn = make_checksum_fn(q, spec, m=m, rows=rows)
    got = int(jax.jit(fn)(jnp.int32(3)))

    nb = (1 << pw) // (rows << m)

    @jax.jit
    def jnp_sum():
        def body(acc, i):
            wv = window_block_outer(i * (rows << m), rows, q, spec, m=m)
            return acc + jnp.sum(wv), None
        s_, _ = jax.lax.scan(body, jnp.int32(3),
                             jnp.arange(nb, dtype=jnp.int32))
        return s_

    assert got == int(jnp_sum())


def test_f32_inkernel_reduce_rows512_on_chip(tpu):
    """The rows=512 f32 tile shape (config 13) compiles and its compiled
    checksum matches the jnp harness to f32 accumulation-order tolerance."""
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.kernels.floatwin import float_window
    from blackman_harris_win_tpu.kernels.pallas.outerwin_kernel import (
        make_checksum_fn_f32,
    )

    pw, m = 20, 11  # nh = 512 -> ONE rows=512 grid step
    fn = make_checksum_fn_f32("bh7", pw, m=m, rows=512)
    got = float(jax.jit(fn)(jnp.int32(0)))
    want = float(jax.jit(lambda: jnp.sum(float_window("bh7", pw, m=m)))())
    assert abs(got - want) < 1e-3 * max(1.0, abs(want)), (got, want)


def test_comp_pair_accuracy_on_chip(tpu):
    """Compensated-f32 on the REAL chip: the error-free-grid argument
    assumes IEEE f32 multiply/add — this pins it on hardware.  A compiled
    pair block spanning the quadrant seam must match the f64 golden to
    pair accuracy (< 5e-9; plain f32 would read ~1e-7)."""
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.kernels.compwin import comp_window_block
    from blackman_harris_win_tpu.windows.catalog import float_window_value

    pw, m = 20, 11
    n0 = (1 << (pw - 2)) - (1 << m)  # block spans the N/4 seam
    fn = jax.jit(lambda: comp_window_block(jnp.int32(n0), 2, "bh7", pw, m=m))
    hi, lo = fn()
    pair = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    idx = n0 + np.arange(2 << m)
    gold = float_window_value("bh7", idx, 1 << pw)
    assert np.max(np.abs(pair - gold)) < 5e-9
    # host normalization of the raw chip pair is exact and non-overlapping
    from blackman_harris_win_tpu.kernels.compwin import normalize_pair

    nh, nl_ = normalize_pair(np.asarray(hi), np.asarray(lo))
    np.testing.assert_array_equal(
        nh, (nh.astype(np.float64) + nl_.astype(np.float64)).astype(np.float32)
    )


def test_comp_inkernel_reduce_on_chip(tpu):
    """The compensated in-kernel-reduce kernel (config 15) compiled on
    chip: checksum matches the jnp pair-sum harness."""
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.kernels.compwin import comp_window_pair
    from blackman_harris_win_tpu.kernels.pallas.outerwin_kernel import (
        make_checksum_fn_comp,
    )

    pw, m = 18, 11
    fn = make_checksum_fn_comp("bh7", pw, m=m, rows=32)
    got = float(jax.jit(fn)(jnp.int32(0)))

    @jax.jit
    def jnp_sum():
        hi, lo = comp_window_pair("bh7", pw, m=m)
        return jnp.sum(hi) + jnp.sum(lo)

    want = float(jnp_sum())
    assert abs(got - want) < 1e-3 * max(1.0, abs(want)), (got, want)


def test_w32_saturate_tracking_on_chip(tpu):
    """The w=32 overflow-count saturate path (round 4) on the chip's int32
    lanes: an overflowing 31-bit-packed set clamps exactly where the exact
    accumulator leaves the range."""
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import (
        window_values,
    )
    from blackman_harris_win_tpu.model import golden

    pw = 12
    q = (576778032, 925936728, 472185493, 145944170, 24743018,
         1860917, 35296)
    n = np.array([0, 1024, 2047, 2048, 2049, 4095], np.int64)
    sat = WindowSpec(pw, 32, rounding="hls", overflow="saturate")
    fn = jax.jit(lambda nn: window_values(nn, q, sat))
    got = np.asarray(fn(jnp.asarray(n, jnp.int32))).astype(np.int64)

    def exact(ni):
        acc = q[0]
        for k in range(1, len(q)):
            c, _ = golden.cordic_hls((k * ni) % (1 << pw), pw, 32)
            m = (q[k] * c) >> 30
            acc = acc - m if k % 2 == 1 else acc + m
        return max(-(1 << 31), min((1 << 31) - 1, acc))

    for i, ni in enumerate(n):
        assert int(got[i]) == exact(int(ni)), ni
    assert int(got[3]) == (1 << 31) - 1  # the clamped peak


def test_taylor_inkernel_reduce_on_chip(tpu):
    """The taylor in-kernel-reduce kernel (modular ROM BlockSpec streaming)
    compiled on chip: checksum == the indexed jnp form bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from blackman_harris_win_tpu.kernels.pallas.taylor_kernel import (
        make_checksum_fn_taylor,
    )
    from blackman_harris_win_tpu.kernels.taylor import taylor_sincos_block

    pw, w, ls, rows = 18, 16, 10, 16
    fn = make_checksum_fn_taylor(pw, w, ls, rows=rows)
    got = int(jax.jit(fn)(jnp.int32(0), jnp.int32(3)))

    r = 1 << (pw - ls - 2)
    nb = (1 << pw) // (rows * r)

    @jax.jit
    def jnp_sum():
        def body(acc, i):
            c, s = taylor_sincos_block(i * rows * r, rows * r, pw, w, ls)
            return acc + jnp.sum(c) + jnp.sum(s), None
        s_, _ = jax.lax.scan(body, jnp.int32(3),
                             jnp.arange(nb, dtype=jnp.int32))
        return s_

    assert got == int(jnp_sum())
