"""Phase decomposition of the whole-sweep mega-kernel on device.

Nulls out kernel phases one at a time (ops/sweep_kernel.py DEBUG_SKIP)
and times full iterations at converged sparsity; the per-phase cost is
the delta vs the full kernel.  Skipped-phase outputs are WRONG, so each
variant re-times from a copy of the same burned-in state and nothing is
chained back into production state.

Usage: python benchmarking/profile_mega.py [--wave 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gmrm_jax_cache")
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--burn", type=int, default=150)
    ap.add_argument("--wave", type=int, default=32)
    ap.add_argument("--block", type=int, default=128)
    args = ap.parse_args()

    from bench import build_dataset, N, MT, TRAITS
    from gmrm_tpu.config import Options
    from gmrm_tpu.runner import load_data, build_static, init_sampler_state
    from gmrm_tpu.sampler.gibbs import make_gibbs_step
    import gmrm_tpu.ops.sweep_kernel as swk

    data_dir = build_dataset()
    opt = Options(
        bed_file=f"{data_dir}/test.bed", dim_file=f"{data_dir}/test.dim",
        phen_files=[f"{data_dir}/test{i+1}.phen" for i in range(TRAITS)],
        group_index_file=f"{data_dir}/test.gri",
        group_mixture_file=f"{data_dir}/test.grm",
        iterations=1, seed=42, block_size=args.block, wave_size=args.wave,
        output_thin_rate=100_000,
    )
    opt.validate()
    opt.load_group_mixtures()
    data = load_data(opt, interleave=args.wave > 1)
    static = build_static(data, opt, jnp.float32)
    state = init_sampler_state(data, opt, jnp.float32)
    shared_na = all(ph.nas == 0 for ph in data.phens)
    print(f"# backend={jax.default_backend()} N={N} MT={MT} T={TRAITS} "
          f"block={args.block} wave={args.wave}", flush=True)

    full = make_gibbs_step(block_size=args.block, use_pallas=True,
                           donate=True, shared_na=shared_na,
                           wave_size=args.wave, megakernel=True)
    it = 1
    for _ in range(args.burn):
        state, _ = full(state, static, jnp.asarray(it, jnp.int32))
        it += 1
    jax.block_until_ready(state.sigmae)
    print(f"# burn-in {args.burn} iters done", flush=True)
    host_state = jax.device_get(state)

    variants = [("full", frozenset()),
                ("-scan", frozenset({"scan"})),
                ("-update", frozenset({"update"})),
                ("-cab", frozenset({"cab"})),
                ("-gramperm", frozenset({"gramperm"})),
                ("-bedp", frozenset({"bedp"})),
                ("-gslayout", frozenset({"gslayout"})),
                ("-scan-upd-cab-gp",
                 frozenset({"scan", "update", "cab", "gramperm"})),
                ("-ALL", frozenset({"scan", "update", "cab", "gramperm",
                                    "bedp", "gslayout"})),
                ("-call (XLA glue only)", frozenset({"call"}))]
    steps = {}
    for name, skip in variants:
        swk.DEBUG_SKIP = skip
        # distinct static kwarg forces a fresh jit cache entry per variant
        step = make_gibbs_step(block_size=args.block, use_pallas=True,
                               donate=True, shared_na=shared_na,
                               wave_size=args.wave, megakernel=True,
                               shuffle=True)
        st = jax.device_put(host_state)
        st, _ = step(st, static, jnp.asarray(10 ** 6 + len(steps),
                                             jnp.int32))
        jax.block_until_ready(st.sigmae)
        swk.DEBUG_SKIP = frozenset()
        steps[name] = step

    results = {n: [] for n, _ in variants}
    states = {n: jax.device_put(host_state) for n, _ in variants}
    for rep in range(args.repeats):
        for name, _ in variants:
            st = states[name]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, _ = steps[name](st, static, jnp.asarray(it, jnp.int32))
                it += 1
            jax.block_until_ready(st.sigmae)
            results[name].append((time.perf_counter() - t0) / args.iters)
            states[name] = st
    base = min(results["full"])
    for name, _ in variants:
        best = min(results[name])
        print(f"{name:>18}: {best*1e3:6.2f} ms/iter   "
              f"delta {1e3*(base-best):+6.2f} ms")


if __name__ == "__main__":
    main()
