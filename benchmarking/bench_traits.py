#!/usr/bin/env python
"""Trait-count scaling sweep (the reference's benchmarking/bench_ardyh.sh
varied 1-5 phenotypes on 2 ranks x 18 threads; here the trait axis is a
free lane dimension so the sweep demonstrates near-flat cost).

Usage: python benchmarking/bench_traits.py [N] [M] [iters]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gmrm_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n=10_000, m=20_000, iters=5):
    from gmrm_tpu.io.sim import simulate
    from gmrm_tpu.config import Options
    from gmrm_tpu.runner import run_training

    out = "/tmp/gmrm_bench_traits"
    if not os.path.exists(os.path.join(out, "test.bed")):
        simulate(out, n=n, m=m, n_traits=5, n_causal=m // 4, h2=0.5,
                 n_groups=1, na_rate=0.0, seed=171014,
                 mixtures=np.array([0.0, 0.0001, 0.001, 0.01]))
    for t in (1, 2, 3, 4, 5):
        opt = Options(
            bed_file=f"{out}/test.bed", dim_file=f"{out}/test.dim",
            phen_files=[f"{out}/test{i+1}.phen" for i in range(t)],
            group_index_file=f"{out}/test.gri",
            group_mixture_file=f"{out}/test.grm",
            iterations=iters, seed=42, block_size=128,
            output_thin_rate=10_000,
        )
        res = run_training(opt, verbose=False)
        steady = float(np.min(res.iter_seconds[2:]))
        print(json.dumps({
            "traits": t, "iter_ms": round(steady * 1000, 2),
            "markers_per_s": round(m / steady, 1),
        }), flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
