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
