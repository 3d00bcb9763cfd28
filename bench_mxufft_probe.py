"""FFT-wall probe, part 3: can MXU matmul DFT stages beat XLA's FFT?

Parts 1-2 established: XLA's FFT runs at ~2-4% of the single-pass HBM
bound at EVERY shape (monolithic or batched, real or complex), rfft is its
best path, and restructurings that still call XLA's FFT (packing, 4-step)
can't break the wall.  A Cooley-Tukey factorization whose small DFTs are
MXU *matmuls* bypasses XLA's FFT kernel entirely:

  N = r1 x r2 x ... : per stage, DFT_r as an (r x r) complex matrix applied
  to a (r, N/r * frames) operand — ideal MXU shapes — with inter-stage
  twiddles as elementwise c64 multiplies.

This probe measures the primitive rates that decide the design:
  G_matmul_f32_r{64,128,1024}: batched real matmul (r, r) @ (r, M) with
     precision=HIGHEST (the f32-accurate MXU path), effective TFLOP/s
  H_dft_stage_r128: one full complex DFT-128 stage over 64M points
     (4 real matmuls + combines), effective complex-samples/s
  I_fft1m_3stage: full 1M FFT as 128 x 128 x 64 mixed-radix matmul
     stages (with twiddles), 64 frames -> rate + accuracy vs XLA rfft

One JSON line per measurement.
"""

import json
import time

import numpy as np

t0 = time.time()


def _stamp(msg):
    print(f"# [{time.time() - t0:7.1f}s] {msg}", flush=True)


def _sync_time(fn, reps=5):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, reps=reps)


def dft_mat(r: int):
    """(r, r) DFT matrix, f64 host accuracy, as (real, imag) f32 pair."""
    k = np.arange(r)
    ang = -2.0 * np.pi * (k[:, None] * k[None, :] % r) / r
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    _stamp(f"devices: {jax.devices()}")
    hi = lax.Precision.HIGHEST

    # ------------------------------------------------------------------
    # G. raw f32 matmul rates at DFT-stage shapes
    # ------------------------------------------------------------------
    for r in (64, 128, 1024):
        m = (1 << 26) // r  # one stage over 64M points

        @jax.jit
        def mm(a, b):
            return jnp.sum(jnp.dot(a, b, precision=hi))

        a = jnp.asarray(np.random.default_rng(0).normal(
            size=(r, r)).astype(np.float32))
        xb = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(1), (r, m), jnp.float32))()
        xb.block_until_ready()
        _stamp(f"compiling G r={r}")
        t = _sync_time(lambda: mm(a, xb))
        fl = 2.0 * r * r * m
        print(json.dumps({"variant": f"G_matmul_f32_r{r}",
                          "tflops": round(fl / t / 1e12, 2),
                          "seconds": round(t, 4)}), flush=True)
        del xb

    # ------------------------------------------------------------------
    # H. one complex DFT-128 stage over 64M c64 points
    # ------------------------------------------------------------------
    r = 128
    m = (1 << 26) // r
    fr_, fi_ = dft_mat(r)
    fr = jnp.asarray(fr_)
    fi = jnp.asarray(fi_)

    @jax.jit
    def xc():
        xr = jax.random.normal(jax.random.PRNGKey(2), (r, m), jnp.float32)
        xi = jax.random.normal(jax.random.PRNGKey(3), (r, m), jnp.float32)
        return xr, xi

    xr, xi = xc()
    xr.block_until_ready()

    @jax.jit
    def stage(xr, xi):
        yr = jnp.dot(fr, xr, precision=hi) - jnp.dot(fi, xi, precision=hi)
        yi = jnp.dot(fr, xi, precision=hi) + jnp.dot(fi, xr, precision=hi)
        return jnp.sum(yr * yr + yi * yi)

    _stamp("compiling H")
    t = _sync_time(lambda: stage(xr, xi))
    n_c = r * m
    print(json.dumps({"variant": "H_dft_stage_r128_c64",
                      "mcsamples_per_s": round(n_c / t / 1e6, 1),
                      "tflops": round(8.0 * r * n_c / t / 1e12, 2),
                      "seconds": round(t, 4)}), flush=True)
    del xr, xi

    # ------------------------------------------------------------------
    # I. full 1M FFT: mixed-radix 128 x 128 x 64 matmul stages, 64 frames
    # ------------------------------------------------------------------
    r1, r2, r3 = 128, 128, 64
    n = r1 * r2 * r3
    nf = 64

    f1r, f1i = (jnp.asarray(v) for v in dft_mat(r1))
    f2r, f2i = (jnp.asarray(v) for v in dft_mat(r2))
    f3r, f3i = (jnp.asarray(v) for v in dft_mat(r3))

    def tw(n_total, a, b):
        """W_{n_total}^{i*j} as (a, b) -> (a, b) c64 table (f64 host)."""
        ii = np.arange(a)
        jj = np.arange(b)
        ang = -2.0 * np.pi * (ii[:, None] * jj[None, :] % n_total) / n_total
        return (jnp.asarray(np.cos(ang).astype(np.float32)),
                jnp.asarray(np.sin(ang).astype(np.float32)))

    # stage-1 twiddle: W_N^{k1 * (n2 r3 + n3)} == W_N^{k1 * rest}
    t1r, t1i = tw(n, r1, r2 * r3)
    # stage-2 twiddle (within each k1 block of length r2*r3):
    # W_{r2 r3}^{k2 * n3}
    t2r, t2i = tw(r2 * r3, r2, r3)

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def cdot(mr, mi, xr, xi):
        yr = jnp.dot(mr, xr, precision=hi) - jnp.dot(mi, xi, precision=hi)
        yi = jnp.dot(mr, xi, precision=hi) + jnp.dot(mi, xr, precision=hi)
        return yr, yi

    # The cdot-over-inner-axes bookkeeping is easier with einsum; measure
    # the einsum formulation directly (XLA lowers it to the same MXU dots).
    def cein(mr, mi, xr, xi, spec):
        yr = (jnp.einsum(spec, mr, xr, precision=hi)
              - jnp.einsum(spec, mi, xi, precision=hi))
        yi = (jnp.einsum(spec, mr, xi, precision=hi)
              + jnp.einsum(spec, mi, xr, precision=hi))
        return yr, yi

    @jax.jit
    def fft1m_power_sum(zr, zi):
        xr = zr.reshape(nf, r1, r2, r3)
        xi = zi.reshape(nf, r1, r2, r3)
        # stage 1: contract n1 (axis 1)
        ar, ai = cein(f1r, f1i, xr, xi, "kn,fnbc->fkbc")
        tr = t1r.reshape(1, r1, r2, r3)
        ti = t1i.reshape(1, r1, r2, r3)
        ar, ai = cmul(ar, ai, tr, ti)
        # stage 2: contract n2 (axis 2)
        br, bi = cein(f2r, f2i, ar, ai, "kn,fanc->fakc")
        ur = t2r.reshape(1, 1, r2, r3)
        ui = t2i.reshape(1, 1, r2, r3)
        br, bi = cmul(br, bi, ur, ui)
        # stage 3: contract n3 (axis 3)
        cr, ci = cein(f3r, f3i, br, bi, "kn,fabn->fabk")
        return jnp.sum(cr * cr + ci * ci, axis=0)  # (r1, r2, r3)

    @jax.jit
    def zmake():
        zr = jax.random.normal(jax.random.PRNGKey(4), (nf, n), jnp.float32)
        zi = jax.random.normal(jax.random.PRNGKey(5), (nf, n), jnp.float32)
        return zr, zi

    zr, zi = zmake()
    zr.block_until_ready()

    _stamp("compiling I (3-stage matmul FFT)")
    @jax.jit
    def xla_power_sum(zr, zi):
        z = jax.lax.complex(zr, zi)
        return jnp.sum(jnp.abs(jnp.fft.fft(z, axis=-1)) ** 2)

    s_mx = float(jnp.sum(fft1m_power_sum(zr, zi)))
    s_xla = float(xla_power_sum(zr, zi))
    rel = abs(s_mx - s_xla) / abs(s_xla)
    print(json.dumps({"variant": "I_checksum_rel_vs_xla", "value": rel}),
          flush=True)

    t = _sync_time(lambda: jnp.sum(fft1m_power_sum(zr, zi)))
    n_c = nf * n
    print(json.dumps({"variant": "I_fft1m_3stage_matmul",
                      "mcsamples_per_s": round(n_c / t / 1e6, 1),
                      "seconds": round(t, 4)}), flush=True)
    t = _sync_time(lambda: xla_power_sum(zr, zi))
    print(json.dumps({"variant": "I_fft1m_xla_cfft",
                      "mcsamples_per_s": round(n_c / t / 1e6, 1),
                      "seconds": round(t, 4)}), flush=True)
    _stamp("done")


if __name__ == "__main__":
    main()
