"""Real-device A/B of the whole-sweep mega-kernel vs the composed path.

First run of ops/sweep_kernel.py through Mosaic (tests exercise interpret
mode only): smoke the compile, check numeric agreement against the
composed per-block path ON DEVICE, then interleaved timing at converged
sparsity (same protocol as profile_split.py / PROFILE.md gotchas).

Usage: python benchmarking/bench_mega.py [--iters 10] [--burn 150]
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

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--burn", type=int, default=150)
    ap.add_argument("--wave", type=int, default=16)
    ap.add_argument("--block", type=int, default=128)
    args = ap.parse_args()

    from bench import build_dataset, N, MT, TRAITS
    from gmrm_tpu.config import Options
    from gmrm_tpu.runner import load_data, build_static, init_sampler_state
    from gmrm_tpu.sampler.gibbs import make_gibbs_step

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
    data = load_data(opt)
    static = build_static(data, opt, jnp.float32)
    state0 = init_sampler_state(data, opt, jnp.float32)
    shared_na = all(ph.nas == 0 for ph in data.phens)
    print(f"# backend={jax.default_backend()} N={N} MT={MT} T={TRAITS} "
          f"block={args.block} wave={args.wave}", flush=True)

    # Above the mega kernel's VMEM ceiling (B > ~256 at this mb_pad —
    # the (2B)^2 Gram quadrants alone are 4 MB at B=512) the production
    # auto-plan runs the COMPOSED cached-Gram path; gate that against
    # the independent Gram-recompute variant instead.
    from gmrm_tpu.ops.sweep_kernel import vmem_fits, vmem_fits_tiled
    mb_pad = static.bed.shape[1]
    fast_is_mega = (vmem_fits(TRAITS, args.block, mb_pad)
                    or vmem_fits_tiled(TRAITS, args.block, mb_pad))
    fast_kw = (dict(megakernel=True) if fast_is_mega
               else dict(megakernel=False, gram_cached=True))
    fast_name = "mega" if fast_is_mega else "composed-cached"
    print(f"# fast path under test: {fast_name}", flush=True)

    # Agreement gate.  Mega fuses the residual update in-kernel, so its
    # like-for-like oracle is the composed path with the fused update
    # (pallas_upd=True) — measured bit-identical on device 2026-08-21.
    # (Against the XLA update the chains drift at the known ~1e-4
    # rounding level and comp choices chaotically flip.)  When gating
    # the composed-cached path instead (B above the mega VMEM ceiling),
    # the oracle keeps the DEFAULT update and only swaps cache ->
    # per-iteration Gram recompute, so the gate isolates the cache.
    step_comp = make_gibbs_step(
        block_size=opt.block_size, use_pallas=True, donate=False,
        shared_na=shared_na, wave_size=args.wave, megakernel=False,
        gram_cached=False, pallas_upd=fast_is_mega)
    step_mega = make_gibbs_step(
        block_size=opt.block_size, use_pallas=True, donate=False,
        shared_na=shared_na, wave_size=args.wave, **fast_kw)

    # ---- numeric agreement on device (2 chained iterations) ----
    t0 = time.perf_counter()
    s_a = s_b = state0
    for it in (1, 2):
        s_a, _ = step_comp(s_a, static, jnp.asarray(it, jnp.int32))
        s_b, _ = step_mega(s_b, static, jnp.asarray(it, jnp.int32))
    s_a, s_b = jax.device_get((s_a, s_b))
    print(f"# compile+2 iters done {time.perf_counter()-t0:.1f}s", flush=True)
    comp_eq = np.array_equal(np.asarray(s_b.comp), np.asarray(s_a.comp))
    db = float(np.max(np.abs(np.asarray(s_b.betas) - np.asarray(s_a.betas))))
    de = float(np.max(np.abs(np.asarray(s_b.eps) - np.asarray(s_a.eps))))
    print(f"# agreement: comp_equal={comp_eq} max|dbeta|={db:.3e} "
          f"max|deps|={de:.3e}", flush=True)
    if not comp_eq or db > 1e-6 or de > 1e-6:
        print("# MEGA-KERNEL DISAGREES ON DEVICE — not safe to enable")
        sys.exit(1)

    # ---- timing at converged sparsity, interleaved ----
    # Two composed baselines: the production default (XLA eps update,
    # pallas_upd=False) and the fused-update variant the agreement gate
    # above validated against (pallas_upd=True) — labeled separately so
    # the reported speedup states which baseline it is measured against.
    donate_comp = make_gibbs_step(
        block_size=opt.block_size, use_pallas=True, donate=True,
        shared_na=shared_na, wave_size=args.wave, megakernel=False)
    donate_comp_fu = make_gibbs_step(
        block_size=opt.block_size, use_pallas=True, donate=True,
        shared_na=shared_na, wave_size=args.wave, megakernel=False,
        pallas_upd=True)
    donate_mega = make_gibbs_step(
        block_size=opt.block_size, use_pallas=True, donate=True,
        shared_na=shared_na, wave_size=args.wave, **fast_kw)

    it = 1
    state = state0
    for _ in range(args.burn):
        state, _ = donate_comp(state, static, jnp.asarray(it, jnp.int32))
        it += 1
    jax.block_until_ready(state.sigmae)
    print(f"# burn-in {args.burn} iters done", flush=True)

    names = ("composed", "composed-fused-upd", fast_name)
    results = {n: [] for n in names}
    # donated steps consume their input buffers: each variant needs its
    # own copy of the burned-in state
    host_state = jax.device_get(state)
    states = {n: jax.device_put(host_state) for n in names}
    steps = {"composed": donate_comp, "composed-fused-upd": donate_comp_fu,
             fast_name: donate_mega}
    for rep in range(args.repeats):
        for name in names:
            st = states[name]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, _ = steps[name](st, static, jnp.asarray(it, jnp.int32))
                it += 1
            jax.block_until_ready(st.sigmae)
            dt = (time.perf_counter() - t0) / args.iters
            states[name] = st
            results[name].append(dt)
    for name, ts in results.items():
        best = min(ts)
        print(f"{name}: best {best*1e3:.2f} ms/iter "
              f"({MT/best:,.0f} markers/s)  all={[f'{t*1e3:.2f}' for t in ts]}")


if __name__ == "__main__":
    main()
