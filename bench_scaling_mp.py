"""Multi-PROCESS weak-scaling harness (CPU, Gloo) — correctness-grade.

Round-3 VERDICT item 5: drive the weak-scaling benchmark through the real
``jax.distributed`` bring-up at 1/2/4 OS processes (2 virtual CPU devices
each) instead of a single process with N devices.  Every child runs the
production ``dist.multihost.initialize()`` path; collectives (the Welch
halo ppermute + psum) cross real process boundaries over Gloo.

    python bench_scaling_mp.py --out SCALING_r04.json

**This is NOT a performance claim.**  All processes share one CPU host, so
wall times include Gloo localhost overhead and core contention; the
artifact demonstrates the full multi-process harness path end-to-end and
records correctness-grade parallel efficiency.  The real >= 90%
weak-scaling north-star needs >= 2 TPU hosts (unavailable on this 1-chip
rig, BENCH_NOTES.md).

Weak scaling: per-device problem size is constant (gen 2^ppd samples and
``frames-per-device`` Welch frames per device), so ideal wall time is flat
across process counts and efficiency(p) = t(1)/t(p).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import socket
import subprocess
import sys

_REPO = pathlib.Path(__file__).resolve().parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env(devs_per_proc: int) -> dict:
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs_per_proc}"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(_REPO)] + env.get("PYTHONPATH", "").split(os.pathsep)
    ).rstrip(os.pathsep)
    return env


def child(argv) -> int:
    port, pid, nprocs, dpp = (int(a) for a in argv[:4])
    ppd, fpd, reps = (int(a) for a in argv[4:7])

    import jax

    from blackman_harris_win_tpu.dist import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    ndev = len(jax.devices())
    assert ndev == nprocs * dpp

    import bench_scaling

    res = bench_scaling.run(
        counts=[ndev], pw_per_device=ppd, nfft=1024, hop=512,
        frames_per_device=fpd, reps=reps,
    )
    if pid == 0:
        print("MP_SCALING " + json.dumps({
            "nprocs": nprocs, "ndev": ndev,
            "gen_seconds": res["gen_seconds"][ndev],
            "welch_seconds": res["welch_seconds"][ndev],
        }), flush=True)
    return 0


def run_mp(proc_counts, devs_per_proc, ppd, fpd, reps):
    rows = []
    for nprocs in proc_counts:
        port = _free_port()
        env = _child_env(devs_per_proc)
        procs = [
            subprocess.Popen(
                [sys.executable, str(_REPO / "bench_scaling_mp.py"),
                 "--child", str(port), str(i), str(nprocs),
                 str(devs_per_proc), str(ppd), str(fpd), str(reps)],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True, cwd=str(_REPO),
            )
            for i in range(nprocs)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=600)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()  # exact PID we spawned
        for i, (p, out) in enumerate(zip(procs, outs)):
            if p.returncode != 0:
                raise RuntimeError(f"child {i}/{nprocs} failed:\n{out}")
        line = next(
            l for l in outs[0].splitlines() if l.startswith("MP_SCALING ")
        )
        rows.append(json.loads(line[len("MP_SCALING "):]))
        print(json.dumps(rows[-1]), flush=True)

    t0g = rows[0]["gen_seconds"]
    t0w = rows[0]["welch_seconds"]
    for r in rows:
        r["gen_efficiency"] = round(t0g / r["gen_seconds"], 3)
        r["welch_efficiency"] = round(t0w / r["welch_seconds"], 3)
    top = rows[-1]
    return {
        "metric": "mp_weak_scaling_efficiency_cpu_gloo",
        "value": min(top["gen_efficiency"], top["welch_efficiency"]),
        "unit": "fraction_vs_ideal",
        "grade": "correctness-grade: 1/2/4 OS processes x 2 virtual CPU "
                 "devices on ONE host over Gloo — demonstrates the "
                 "multi-process harness path, NOT a TPU perf claim",
        "per_device_gen_samples": None,  # filled by main
        "rows": rows,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--child", nargs="+", default=None,
                   help="internal: run as a coordinated child process")
    p.add_argument("--procs", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--devs-per-proc", type=int, default=2)
    p.add_argument("--pw-per-device", type=int, default=16)
    p.add_argument("--frames-per-device", type=int, default=32)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default=None, help="write the JSON artifact here")
    args = p.parse_args(argv)

    if args.child is not None:
        return child(args.child)

    out = run_mp(args.procs, args.devs_per_proc, args.pw_per_device,
                 args.frames_per_device, args.reps)
    out["per_device_gen_samples"] = 1 << args.pw_per_device
    out["host_cores"] = os.cpu_count()
    out["note"] = (
        "all processes share this one host's cores: per-device work is "
        "constant, so total work grows with nprocs on fixed silicon and "
        "the wall-time growth tracks core contention (gen, zero-comm, "
        "scales ~1/nprocs exactly).  The artifact's claim is that the "
        "1/2/4-process jax.distributed+Gloo harness runs the production "
        "sharded gen/Welch path end-to-end, not an efficiency number."
    )
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
