"""Throughput / roofline instrumentation.

The reference's observability is its valid-bit chains (latency made visible,
``src/cordic_dds.vhd:221-222``); the TPU equivalent is samples/s counters, a
roofline model against peak HBM bandwidth / VPU integer throughput, and
``jax.profiler`` trace capture (SURVEY.md §5).

Timing rule learned the hard way on this backend: ``block_until_ready`` can
return before device completion on tunneled TPUs — always sync on a *host
value* (a scalar checksum transfer) when timing.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

#: Rough per-chip peaks for roofline context (public figures; v5e defaults).
#: ``vpu_int_gops`` is the scalar-op issue peak (one add/mul/shift per ALU
#: slot per cycle).  Each ALU slot can instead retire a fused multiply-add
#: (2 ops), so the *op-counted* ceiling for FMA-friendly code is
#: ``VPU_FMA_OPS_PER_SLOT`` x this figure — no kernel can exceed that, which
#: is what makes the ``vpu_frac`` field below physically <= 1.
CHIP_PEAKS = {
    "v5e": {"hbm_gbps": 819.0, "vpu_int_gops": 3500.0},
    "v5p": {"hbm_gbps": 2765.0, "vpu_int_gops": 7000.0},
}

#: Ops retired per ALU slot when a multiply pairs with its dependent
#: add/sub (fused multiply-add).  The analytic kernel op models count
#: mul and add separately (no-fusion), so the achievable op ceiling is
#: this factor times the scalar peak.
VPU_FMA_OPS_PER_SLOT = 2.0


def host_synced_seconds(fn, *args, reps: int = 5) -> float:
    """Median wall time of ``fn(*args)`` with a host-value sync each rep.
    ``fn`` must return a jax scalar (e.g. a checksum) so completion is
    observable on the host."""
    float(jnp.asarray(fn(*args)).sum())  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(jnp.asarray(fn(*args)).sum())
        ts.append(time.time() - t0)
    return float(np.median(ts))


@dataclass
class KernelReport:
    """One kernel's measured throughput with roofline context."""

    name: str
    samples: int
    seconds: float
    bytes_moved: int = 0
    int_ops: int = 0
    chip: str = "v5e"

    @property
    def msamples_per_s(self) -> float:
        return self.samples / self.seconds / 1e6

    @property
    def hbm_fraction(self) -> float:
        peak = CHIP_PEAKS[self.chip]["hbm_gbps"] * 1e9
        return (self.bytes_moved / self.seconds) / peak if self.bytes_moved else 0.0

    @property
    def vpu_fraction(self) -> float:
        """Fraction of the FMA-credited op ceiling (physically <= 1; see
        :func:`roofline_fields`)."""
        peak = CHIP_PEAKS[self.chip]["vpu_int_gops"] * 1e9
        peak *= VPU_FMA_OPS_PER_SLOT
        return (self.int_ops / self.seconds) / peak if self.int_ops else 0.0

    def json_line(self) -> str:
        return json.dumps(
            {
                "kernel": self.name,
                "msamples_per_s": round(self.msamples_per_s, 1),
                "hbm_frac": round(self.hbm_fraction, 3),
                "vpu_frac": round(self.vpu_fraction, 3),
                "seconds": round(self.seconds, 4),
            }
        )


def cordic_window_int_ops(n_samples: int, n_terms: int, data_width: int,
                          wide: bool) -> int:
    """Analytic op-count model of the fused window kernel (for the VPU
    roofline): per sample, (K-1) CORDICs x W iterations x ops/iter plus the
    product/accumulate stage."""
    per_iter = 22 if wide else 8
    per_prod = 12 if wide else 2
    k = n_terms - 1
    return n_samples * (k * data_width * per_iter + k * per_prod + n_terms)


def outer_window_int_ops(n_samples: int, n_terms: int) -> int:
    """Analytic op-count model of the outer-product fast mode
    (kernels/outerwin.py): per sample and harmonic, one fused
    ``mulsub_shift30`` (2 x _mul_parts30 cross terms + combine ~ 33 VPU ops
    after XLA CSEs the per-row/per-column 15-bit limb splits) plus the
    accumulate."""
    return n_samples * ((n_terms - 1) * 33 + 2)


def roofline_fields(seconds: float, int_ops: int = 0, bytes_moved: int = 0,
                    chip: str = "v5e") -> dict:
    """The bench JSON roofline fields (BENCH_NOTES.md documents the op/byte
    models behind each config).

    ``vpu_frac`` is utilization of the FMA-credited op ceiling
    (``VPU_FMA_OPS_PER_SLOT`` x the scalar-op peak): an ALU slot retires at
    most one mul+add pair per cycle, so no kernel's op rate can exceed that
    ceiling and the field is physically <= 1.  ``opmodel_nofma_x`` is the
    measured op rate over the *no-fusion* scalar-op peak — a bound ratio,
    not a utilization: a value above 1.0 means FMA fusion demonstrably
    covers the difference (the analytic models count mul and add as
    separate ops).  True slot utilization lies in
    [vpu_frac, min(1, opmodel_nofma_x)]."""
    peaks = CHIP_PEAKS[chip]
    vp = peaks["vpu_int_gops"] * 1e9
    return {
        "vpu_frac": round(int_ops / seconds / (vp * VPU_FMA_OPS_PER_SLOT), 3)
        if int_ops else 0.0,
        "opmodel_nofma_x": round(int_ops / seconds / vp, 3)
        if int_ops else 0.0,
        "hbm_frac": round(bytes_moved / seconds / (peaks["hbm_gbps"] * 1e9), 3)
        if bytes_moved else 0.0,
    }


@contextlib.contextmanager
def trace(dir_path: str):
    """jax.profiler trace capture contextmanager (view with tensorboard or
    xprof)."""
    jax.profiler.start_trace(dir_path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
