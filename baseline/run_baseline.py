"""Measure the compiled reference gmrm as the real CPU baseline.

Builds the UNMODIFIED reference sources (/root/reference/src) against the
single-rank MPI stub + boost shims in ./shim (the image ships no MPI/Boost
dev headers), runs it on the bench dataset (N=10k x Mt=20k, 4 traits — the
reference's correctness-anchor scale, example/part1_gcc_mvapich2.sh), and
records markers/s into BASELINE_MEASURED.json.

The reference's intended production config is 2 MPI ranks x 18 OMP threads
(benchmarking/bench_ardyh.sh:66-90); on this host we run 1 rank x all
cores.  Its hot loops are OpenMP-parallel over individuals, so throughput
scales ~linearly with cores; the JSON records cores used so the ratio can
be normalized.

Usage: python baseline/run_baseline.py [--iterations 20] [--data DIR]
"""

import argparse
import json
import os
import platform
import re
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BINARY = os.path.join(HERE, "build", "gmrm_ref")


def build():
    subprocess.run(["make", "-C", HERE], check=True, capture_output=True)
    return BINARY


def ensure_dataset(data_dir):
    sys.path.insert(0, REPO)
    from bench import build_dataset
    return build_dataset(data_dir)


def run_reference(data_dir, iterations, threads, out_dir="/tmp/gmrm_ref_out"):
    subprocess.run(["rm", "-rf", out_dir], check=True)
    phens = ",".join(f"{data_dir}/test{i}.phen" for i in range(1, 5))
    cmd = [
        BINARY,
        "--bed-file", f"{data_dir}/test.bed",
        "--dim-file", f"{data_dir}/test.dim",
        "--phen-files", phens,
        "--group-index-file", f"{data_dir}/test.gri",
        "--group-mixture-file", f"{data_dir}/test.grm",
        "--iterations", str(iterations),
        "--seed", "171014",
        "--shuffle-markers", "1",
        "--out-dir", out_dir,
        "--output-thin-rate", str(max(1, iterations // 4)),
    ]
    env = dict(os.environ, OMP_NUM_THREADS=str(threads))
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=3600)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{proc.stdout[-2000:]}"
                           f"\n{proc.stderr[-2000:]}")
    # "RESULT : It 3  total proc time =   0.439 sec, with sync time = ..."
    iter_s = [float(m.group(1)) for m in re.finditer(
        r"total proc time =\s+([0-9.]+) sec", proc.stdout)]
    return iter_s, wall, proc.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--data", default="/tmp/gmrm_bench_data")
    ap.add_argument("--threads", type=int, default=os.cpu_count())
    args = ap.parse_args()

    build()
    data_dir = ensure_dataset(args.data)
    iter_s, wall, _ = run_reference(data_dir, args.iterations, args.threads)
    steady = iter_s[2:] if len(iter_s) > 4 else iter_s
    med = statistics.median(steady)
    mt = 20_000
    out = {
        "binary": "reference gmrm (unmodified /root/reference/src, "
                  "-Ofast -march=native -fopenmp -DMANVECT, single-rank "
                  "MPI stub)",
        "workload": "N=10000 x Mt=20000, 4 traits, shuffle on, seed 171014",
        "iterations": args.iterations,
        "omp_threads": args.threads,
        "cpu_count": os.cpu_count(),
        "platform": platform.processor() or platform.machine(),
        "iter_s_median": round(med, 4),
        "iter_s_all": [round(x, 4) for x in iter_s],
        "markers_per_s": round(mt / med, 1),
        "wall_s": round(wall, 2),
    }
    path = os.path.join(HERE, "BASELINE_MEASURED.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))
    print(f"# written to {path}")


if __name__ == "__main__":
    main()
