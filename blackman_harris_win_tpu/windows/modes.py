"""Generation-mode advisor: pick the fastest mode that meets a floor /
exactness requirement.

The framework carries six generation modes with ~30x speed spread and
different contracts (chip-measured at 64M points, BENCH_NOTES.md round 4;
numbers are the in-process sweep values — cross-process regimes scale them
together):

  exact    bit-exact HLS CORDIC datapath          ~1.1  Gsamp/s  (full int contract)
  rtl      bit-exact VHDL rounding contract       ~1.0  Gsamp/s
  taylor   bit-exact TAYLOR-source contract       ~15   Gsamp/s  (2/3-term only)
  outer    int fast mode (floor-held approx)      ~12.7 Gsamp/s
  float    native f32 (floor == f64 thru 5 terms) ~31   Gsamp/s  (BH-7: -163 dB)
  comp     compensated-f32 (hi, lo) pair          ~24   Gsamp/s  (full f64 floor)

The non-obvious rules this encodes:

- For 2/3-term windows needing a *bit-exact integer* contract, the TAYLOR
  source is itself a reference contract (src/taylor_sincos.vhd) AND runs
  ~14x the CORDIC datapath — exactness does not force the slow path there.
- Plain f32 serves every catalog window through 5 terms at full floor;
  only the 7-term contracts need the compensated pair (pure-f32 output
  physically floors at -178.6 dB at pw=16).
- The int fast mode ("outer") only wins when the consumer needs *integer*
  samples but not bit-exactness.
- In the fused window->FFT deployment the generator runs in the FFT's
  shadow and the comp pair is ~4-6% FASTER than the int mode (it drops
  the int->f32 convert pass; BENCH_NOTES round 4) — standalone
  generation throughput is not the deployment ranking.
"""

from __future__ import annotations

from dataclasses import dataclass

from .catalog import get


# chip-measured 64M throughputs (Gsamp/s, one v5e; BENCH_NOTES round 4)
MODE_GSPS = {
    "exact": 1.1,
    "rtl": 1.0,
    "taylor": 14.8,
    "outer": 12.7,
    "float": 31.0,
    "comp": 24.0,
}

# deepest floor plain f32 can hold (measured: BH-7 reads -163 of -180;
# everything at or above this level matches the f64 floor exactly)
_F32_FLOOR_DB = -160.0


@dataclass(frozen=True)
class ModeChoice:
    mode: str  # exact | rtl | taylor | outer | float | comp
    est_gsamp_s: float
    rationale: str


def recommend_mode(
    name_or_coeffs,
    consumer: str = "float",
    exactness: str = "floor",
    target_db: float | None = None,
) -> ModeChoice:
    """Fastest generation mode meeting the requirement.

    consumer:  "float" (downstream multiplies f32 frames — Welch/STFT/
               WOLA) or "int" (integer samples leave the generator, e.g.
               feeding an integer FFT core like the reference's).
    exactness: "bit-exact" (sample-for-sample reference contract) or
               "floor" (the published side-lobe floor must hold
               spectrally; samples may differ — the fast modes).
    target_db: required floor; defaults to the window's published level
               (coefficient tuples default to the -180 dB class).
    """
    if consumer not in ("float", "int"):
        raise ValueError("consumer must be 'float' or 'int'")
    if exactness not in ("bit-exact", "floor"):
        raise ValueError("exactness must be 'bit-exact' or 'floor'")

    if isinstance(name_or_coeffs, str):
        d = get(name_or_coeffs)
        n_terms = d.n_terms
        published = d.sidelobe_db
    else:
        n_terms = len(tuple(name_or_coeffs))
        published = None
    if target_db is None:
        target_db = published if published is not None else -180.0

    def choice(mode, why):
        return ModeChoice(mode, MODE_GSPS[mode], why)

    if consumer == "int":
        if exactness == "bit-exact":
            if n_terms <= 3:
                return choice(
                    "taylor",
                    "2/3-term + bit-exact: the TAYLOR-source datapath is "
                    "itself a reference contract and the blocked kernel "
                    "runs ~14x the CORDIC path "
                    "(kernels/taylor.py:taylor_window_range)",
                )
            return choice(
                "exact",
                "bit-exact integer contract at 4+ terms: the fused HLS "
                "CORDIC datapath (kernels/window.py; RTL rounding via "
                "rounding='rtl' ties it)",
            )
        return choice(
            "outer",
            "integer samples with a spectrally-held floor: the "
            "outer-product angle-addition fast mode "
            "(kernels/outerwin.py, floor-validated)",
        )

    # float consumer
    if exactness == "bit-exact":
        # "bit-exact" has no meaning for float output; the strictest float
        # statement is the compensated pair (exact to ~3e-10)
        return choice(
            "comp",
            "float consumer wanting the strongest accuracy statement: the "
            "compensated (hi, lo) pair carries the f64 window to ~3e-10 "
            "(kernels/compwin.py)",
        )
    if target_db >= _F32_FLOOR_DB:
        return choice(
            "float",
            f"plain f32 holds {target_db:.0f} dB (f32 floor == f64 floor "
            "through 5-term windows; kernels/floatwin.py) — the fastest "
            "mode",
        )
    return choice(
        "comp",
        f"{target_db:.0f} dB exceeds plain f32's ~-163 dB reach: the "
        "compensated (hi, lo) pair holds the full f64 floor "
        "(kernels/compwin.py; apply as x*hi + x*lo)",
    )
