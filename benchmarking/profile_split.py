"""Decompose the Gibbs iteration time on the real device.

A/B variants of the jitted step:
  fused W=<w>   — fused Pallas decode+Gram+update kernels
                  (ops/pallas_kernels.py) + wave-W scan kernel
  xla-gram W=<w>— wave-W scan kernel but the XLA Gram path (decoded
                  planes materialized in HBM); the r1 production path
  serial (W=1)  — exact serial recursion kernel, fused Gram
  xla-scan      — pure XLA everywhere (no Pallas at all)
  null-scan     — serial recursion replaced by a cheap map; keeps the
                  Gram + eps-update + permute pipeline, so this is the
                  sweep's compute/bandwidth floor.  Run for both Gram
                  paths: the difference is the decoded-plane HBM cost.

Writes benchmarking/PROFILE.md.  Run on the TPU (default backend).

Usage: python benchmarking/profile_split.py [--blocks 128,256] [--waves 8,16,32]
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

N, MT, TRAITS = 10_000, 20_000, 4
WARM, MEAS, REPEATS = 2, 10, 3


def time_step(step, state, static, burn_in=0, burn_step=None):
    it = 1
    if burn_in:
        bs = burn_step or step
        for _ in range(burn_in):
            state, _ = bs(state, static, jnp.asarray(it, jnp.int32))
            it += 1
    for _ in range(WARM):
        state, _ = step(state, static, jnp.asarray(it, jnp.int32))
        it += 1
    jax.block_until_ready(state.sigmae)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(MEAS):
            state, _ = step(state, static, jnp.asarray(it, jnp.int32))
            it += 1
        jax.block_until_ready(state.sigmae)
        best = min(best, (time.perf_counter() - t0) / MEAS)
    return best


def null_scan(c, gs, beta_old, comp_old, acum_old, grp, valid, u, z,
              sigmag, sigmae, pi_est, cva, cvai, nonas, n_total,
              axis_name=None):
    """Scan stand-in: cheap elementwise map, keeps downstream work alive."""
    from gmrm_tpu.sampler.scan import BlockScanResult
    d = (u - 0.5) * 1e-6
    return BlockScanResult(
        dbeta_eff=d, beta_new=beta_old + d, comp_new=comp_old,
        acum_new=acum_old + d,
        cass_inc=jnp.zeros((c.shape[0],) + cva.shape, jnp.int32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="128,256")
    ap.add_argument("--waves", default="8,16,32")
    ap.add_argument("--burn", type=int, default=150,
                    help="burn-in iterations before timing (converged "
                         "sparsity; the realistic steady state)")
    ap.add_argument("--trace", action="store_true",
                    help="also dump a jax.profiler trace of the full step")
    args = ap.parse_args()
    blocks = [int(b) for b in args.blocks.split(",")]
    waves = [int(w) for w in args.waves.split(",")]

    from bench import build_dataset
    from gmrm_tpu.config import Options
    from gmrm_tpu.runner import load_data, build_static, init_sampler_state
    from gmrm_tpu.sampler.gibbs import make_gibbs_step
    import gmrm_tpu.ops.scan_kernel as sk

    data_dir = build_dataset()
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    print(f"# backend = {backend}", file=sys.stderr, flush=True)

    rows = []
    serial_impl = sk.block_scan_pallas
    for B in blocks:
        opt = Options(
            bed_file=f"{data_dir}/test.bed", dim_file=f"{data_dir}/test.dim",
            phen_files=[f"{data_dir}/test{i + 1}.phen" for i in range(TRAITS)],
            group_index_file=f"{data_dir}/test.gri",
            group_mixture_file=f"{data_dir}/test.grm",
            iterations=1, seed=42, block_size=B, output_thin_rate=10 ** 9,
        )
        opt.validate()
        opt.load_group_mixtures()
        data = load_data(opt)
        static = build_static(data, opt, jnp.float32)
        state0 = init_sampler_state(data, opt, jnp.float32)
        shared_na = all(ph.nas == 0 for ph in data.phens)

        def mk(use_pallas=on_tpu, wave=1, pallas_gram=True):
            return make_gibbs_step(
                block_size=B, use_pallas=use_pallas, donate=False,
                shared_na=shared_na, wave_size=wave, pallas_gram=pallas_gram)

        # Converged-chain state: burn in once with the production step.
        state = state0
        if args.burn:
            bs = mk(wave=waves[-1] if on_tpu else 1)
            it = 1
            for _ in range(args.burn):
                state, _ = bs(state, static, jnp.asarray(it, jnp.int32))
                it += 1
            jax.block_until_ready(state.sigmae)

        variants = {}
        if on_tpu:
            for w in waves:
                variants[f"fused W={w}"] = time_step(
                    mk(wave=w), state, static)
                variants[f"xla-gram W={w}"] = time_step(
                    mk(wave=w, pallas_gram=False), state, static)
            variants["serial fused (W=1)"] = time_step(mk(), state, static)
        variants["xla-scan"] = time_step(mk(use_pallas=False), state, static)
        for gram_name, pg in (("fused", True), ("xla-gram", False)):
            sk.block_scan_pallas = null_scan
            variants[f"null-scan {gram_name}"] = time_step(
                mk(use_pallas=on_tpu, pallas_gram=pg), state, static)
            sk.block_scan_pallas = serial_impl

        for name, tsec in variants.items():
            rows.append((B, name, tsec * 1000))
            print(f"# B={B:4d} {name:18s} {tsec * 1000:8.2f} ms/iter",
                  file=sys.stderr, flush=True)

    lines = [
        "# Iteration time decomposition (real-device A/B)",
        "",
        f"Backend: {backend}.  Workload: N={N}, Mt={MT}, T={TRAITS} "
        f"(the bench anchor), {args.burn}-iteration burn-in (converged "
        f"sparsity).  Best of {REPEATS}x{MEAS} timed iterations.",
        "",
        "| block | variant | ms/iter | markers/s |",
        "|---|---|---|---|",
    ]
    for B, name, ms in rows:
        lines.append(f"| {B} | {name} | {ms:.2f} | {MT / ms * 1000:,.0f} |")
    lines += [
        "",
        "`fused` = in-kernel 2-bit decode (ops/pallas_kernels.py); "
        "`xla-gram` = decoded planes via XLA (ops/blockops.py).  "
        "`null-scan` rows carry the Gram + eps-update + permute pipeline "
        "only — the sweep floor for each Gram path.",
        "",
    ]
    with open(os.path.join(HERE, "PROFILE.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))

    if args.trace and on_tpu:
        tdir = "/tmp/gmrm_profile_trace"
        step = mk(wave=waves[-1])
        state, _ = step(state, static, jnp.asarray(1, jnp.int32))
        jax.block_until_ready(state.sigmae)
        with jax.profiler.trace(tdir):
            state, _ = step(state, static, jnp.asarray(2, jnp.int32))
            jax.block_until_ready(state.sigmae)
        print(f"# trace written to {tdir}", file=sys.stderr)


if __name__ == "__main__":
    main()
