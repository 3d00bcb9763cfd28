"""FFT-wall probe, part 5: tune the MXU matmul-FFT (precision x radices).

Part 4 (amortized): welch packed+3-stage-matmul = 2176 Msamp/s vs rfft
1671 (1.30x).  Tuning axes:
  - matmul precision: HIGHEST (6-pass bf16, ~f32) vs HIGH (3-pass bf16)
  - factorization: (128,128,64) vs (32,32,32,32) vs (1024,1024)
Each variant: full config-4 welch analyzer, packed frames, REPS=8 scanned,
plus a checksum agreement vs the rfft path (accuracy must hold the
quantization floor, see BENCH_NOTES).
"""

import json
import time

import numpy as np

t0 = time.time()
REPS = 8


def _stamp(msg):
    print(f"# [{time.time() - t0:7.1f}s] {msg}", flush=True)


def _sync_time(fn, reps=3):
    from blackman_harris_win_tpu.utils.profiling import host_synced_seconds

    return host_synced_seconds(fn, reps=reps)


def dft_mat(r: int):
    k = np.arange(r)
    ang = -2.0 * np.pi * (k[:, None] * k[None, :] % r) / r
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from blackman_harris_win_tpu.core.config import WindowSpec
    from blackman_harris_win_tpu.kernels.pallas.window_kernel import (
        window_values,
    )
    from blackman_harris_win_tpu.pipeline.spectral import (
        frames_view,
        welch_power,
        window_scale,
    )
    from blackman_harris_win_tpu.windows import catalog

    _stamp(f"devices: {jax.devices()}")

    def make_mxu_power(radices, precision):
        """sum-of-|FFT|^2 over (nf, N) complex frames via matmul stages."""
        n = int(np.prod(radices))
        mats = [tuple(jnp.asarray(v) for v in dft_mat(r)) for r in radices]
        # stage-s twiddle: W_{prod(radices[s:])}^{k_s * rest_index}
        tws = []
        for s_i, r in enumerate(radices[:-1]):
            nt = int(np.prod(radices[s_i:]))
            rest = nt // r
            ii, jj = np.arange(r), np.arange(rest)
            ang = -2.0 * np.pi * (ii[:, None] * jj[None, :] % nt) / nt
            tws.append((jnp.asarray(np.cos(ang).astype(np.float32)),
                        jnp.asarray(np.sin(ang).astype(np.float32))))

        def cmul(ar, ai, br, bi):
            return ar * br - ai * bi, ar * bi + ai * br

        def power(zr, zi):
            nf = zr.shape[0]
            ns = len(radices)
            xr = zr.reshape((nf,) + tuple(radices))
            xi = zi.reshape((nf,) + tuple(radices))
            # axes: (f, k_0, .., k_{s-1}, n_s, .., n_{ns-1})
            for s_i, r in enumerate(radices):
                mr, mi = mats[s_i]
                ax = 1 + s_i
                # contract axis ax with the DFT matrix
                yr = (jnp.tensordot(xr, mr, axes=[[ax], [1]], precision=precision)
                      - jnp.tensordot(xi, mi, axes=[[ax], [1]], precision=precision))
                yi = (jnp.tensordot(xr, mi, axes=[[ax], [1]], precision=precision)
                      + jnp.tensordot(xi, mr, axes=[[ax], [1]], precision=precision))
                # tensordot moves the contracted axis to the END; put k_s
                # back at position ax
                perm = list(range(xr.ndim - 1))
                perm.insert(ax, xr.ndim - 1)
                xr = jnp.transpose(yr, perm)
                xi = jnp.transpose(yi, perm)
                if s_i < ns - 1:
                    twr, twi = tws[s_i]
                    rest = int(np.prod(radices[s_i + 1:]))
                    shape = [1] * (1 + s_i) + [r, rest]
                    a = xr.reshape(tuple(xr.shape[: 1 + s_i]) + (r, rest))
                    b = xi.reshape(tuple(xi.shape[: 1 + s_i]) + (r, rest))
                    a, b = cmul(a, b, twr.reshape(shape), twi.reshape(shape))
                    xr = a.reshape(xr.shape)
                    xi = b.reshape(xi.shape)
            return jnp.sum(xr * xr + xi * xi)

        return power, n

    nfft, hop = 1 << 20, 1 << 19
    spec4 = WindowSpec(20, 17, overflow="saturate")
    q4 = catalog.get("bh4").quantized(17)
    sc = window_scale(spec4, catalog.get("bh4").shift)
    T = 128 * nfft
    xw = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (T,), jnp.float32))()
    xw.block_until_ready()

    def win():
        wq = window_values(jnp.arange(nfft, dtype=jnp.int32), q4, spec4)
        return wq.astype(jnp.float32) * jnp.float32(sc)

    def packed_frames(xv):
        fr = frames_view(xv, nfft, hop) * win()
        nf = fr.shape[-2]
        if nf % 2:
            fr = jnp.pad(fr, [(0, 1), (0, 0)])
        return fr[0::2, :], fr[1::2, :]

    def timed(tag, fn):
        @jax.jit
        def run(xv):
            def body(acc, i):
                return acc + fn(jnp.roll(xv, i)), None

            s, _ = lax.scan(body, jnp.float32(0),
                            jnp.arange(REPS, dtype=jnp.int32))
            return s

        t = _sync_time(lambda: run(xw)) / REPS
        print(json.dumps({"variant": tag,
                          "msamples_per_s_in": round(T / t / 1e6, 1),
                          "seconds_per_rep": round(t, 5)}), flush=True)

    def welch_rfft(xv):
        return jnp.sum(welch_power(xv, win(), nfft, hop))

    ref = None
    hi = lax.Precision.HIGHEST
    hg = lax.Precision.HIGH
    variants = [
        ("K_welch_rfft", None, None),
        ("K_p3_HIGHEST", (128, 128, 64), hi),
        ("K_p3_HIGH", (128, 128, 64), hg),
        ("K_p4_HIGHEST", (32, 32, 32, 32), hi),
        ("K_p4_HIGH", (32, 32, 32, 32), hg),
        ("K_p2_1024_HIGH", (1024, 1024), hg),
    ]
    for tag, radices, prec in variants:
        if radices is None:
            fn = welch_rfft
        else:
            power, _ = make_mxu_power(radices, prec)

            def fn(xv, power=power):
                zr, zi = packed_frames(xv)
                return power(zr, zi)

        _stamp(f"compiling {tag}")
        v = float(jax.jit(fn)(xw))
        if ref is None:
            ref = v
        rel = abs(v - ref) / abs(ref)
        print(json.dumps({"variant": tag + "_checksum_rel", "value": rel}),
              flush=True)
        timed(tag, fn)
    _stamp("done")


if __name__ == "__main__":
    main()
