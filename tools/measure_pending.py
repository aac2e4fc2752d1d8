#!/usr/bin/env python3
"""Run every pending TPU measurement (round 4: lane-grouped defaults).

Probes the backend first (subprocess + timeout, the tunnel can hang
forever), then runs, in order:

  1. tools/tpu_equiv_check.py      — on-chip equivalence (tall-dot stacking
                                     is bitwise per row; gate must not move)
  2. tools/bench_assembled.py      — t4 / nofuse / kernel-only sweep
  3. bench.py --ne 30 --prim       — composed full-cadence number
  4. bench.py --ne 30 --prim --qsize 35 — tracer-heavy cadence
  5. bench.py                      — headline raw kernel
  6. bench.py --ne 120             — assembled ne120 (+ --ring A/B)
  7. compile-time gate             — cold --prim compile with a FRESH
                                     cache dir + --scan, then a second
                                     process reusing the persistent cache
                                     (VERDICT r2 item 7: cold <= 30 s or
                                     warm reuse <= 5 s)

Each step gets its own timeout; results append to MEASURE_PENDING.log and
the bench JSON lines are echoed for manual BENCH_LOCAL.json updates.

    python tools/measure_pending.py [--skip-probe]
"""
import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tag, cmd, timeout, log):
    print(f"== {tag}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    try:
        r = subprocess.run(cmd, cwd=HERE, capture_output=True, text=True,
                           timeout=timeout)
        out = r.stdout[-4000:] + r.stderr[-2000:]
        status = f"rc={r.returncode}"
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace")[-2000:]
               if isinstance(e.stdout, bytes) else str(e.stdout)[-2000:])
        status = "TIMEOUT"
    dtm = time.time() - t0
    entry = f"\n===== {tag} ({status}, {dtm:.0f}s) =====\n{out}\n"
    log.write(entry)
    log.flush()
    print(entry, flush=True)
    return status


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()

    if not args.skip_probe:
        try:
            ok = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, capture_output=True).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print("TPU backend still unavailable — nothing run.")
            return 1

    py = sys.executable
    with open(os.path.join(HERE, "MEASURE_PENDING.log"), "a") as log:
        log.write(f"\n######## measure_pending {time.ctime()} ########\n")
        run("tpu_equiv", [py, "tools/tpu_equiv_check.py"], 1200, log)
        run("assembled_sweep",
            [py, "tools/bench_assembled.py", "--variants", "t_kernel_only",
             "t4_structured", "t4_structured_nofuse",
             "--nexec", "150",
             "--reps", "2"], 1500, log)
        run("headline", [py, "bench.py"], 1200, log)
        run("ne120_assembled", [py, "bench.py", "--ne", "120",
                                "--nexec", "40", "--reps", "2"], 2700, log)
        run("ne120_kernel_ab",
            [py, "tools/bench_ne120_kernel.py", "--nexec", "40",
             "--reps", "2", "--chunk", "10",
             "--variants", "eb8", "lg8"], 3600, log)
        run("prim_ne30", [py, "bench.py", "--ne", "30", "--prim",
                          "--nexec", "100", "--reps", "2"], 2400, log)
        run("prim_ne30_q35", [py, "bench.py", "--ne", "30", "--prim",
                              "--qsize", "35", "--nexec", "30",
                              "--reps", "2"], 2400, log)
        run("prim_ne30_q35_limit",
            [py, "bench.py", "--ne", "30", "--prim", "--qsize", "35",
             "--limit", "--nexec", "30", "--reps", "2"], 2700, log)
        run("prim_ne30_hvfast",
            [py, "bench.py", "--ne", "30", "--prim", "--hv-dots", "fast",
             "--nexec", "100", "--reps", "2"], 2400, log)
        # compile-time gate (VERDICT r2 item 7): cold --scan compile into a
        # FRESH cache dir, then a second process reusing that cache. The
        # bench line's "warmup_s" field carries the number (compile_s
        # only exists in tools/compile_gate.py output); the warm run
        # passing in <= ~60 s wall total implies cache reuse worked.
        cold_dir = os.path.join(HERE, ".jax_cache_gate")
        import shutil
        shutil.rmtree(cold_dir, ignore_errors=True)
        env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=cold_dir)
        for tag, tmo in (("prim_compile_cold_scan", 2400),
                         ("prim_compile_warm_cache", 1200)):
            print(f"== {tag}", flush=True)
            t0 = time.time()
            try:
                r = subprocess.run(
                    [py, "bench.py", "--ne", "30", "--prim", "--scan",
                     "--nexec", "10", "--reps", "1"],
                    cwd=HERE, capture_output=True, text=True, timeout=tmo,
                    env=env)
                out = r.stdout[-3000:] + r.stderr[-1500:]
                status = f"rc={r.returncode}"
            except subprocess.TimeoutExpired:
                out, status = "", "TIMEOUT"
            entry = (f"\n===== {tag} ({status}, {time.time() - t0:.0f}s "
                     f"wall) =====\n{out}\n")
            log.write(entry)
            log.flush()
            print(entry, flush=True)
    print("done — see MEASURE_PENDING.log")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
