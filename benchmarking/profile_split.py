"""Decompose the Gibbs iteration time on the real device.

Answers VERDICT r1 item 3: where does the 14.7 ms iteration go —
Gram matmuls, the serial within-block scan, or the permute/bookkeeping?

Method: A/B variants of the jitted step at several block sizes,
  full      — the production path (Pallas scan kernel v1)
  v3        — with the experimental packed-IO scan kernel v3
  xla-scan  — with the XLA lax.scan recursion (no Pallas)
  null-scan — serial recursion replaced by a fixed cheap map (keeps the
              Gram + eps-update + permute pipeline, removes the scan);
              full - null-scan ~= the scan's cost.

Writes benchmarking/PROFILE.md.  Run on the TPU (default backend).

Usage: python benchmarking/profile_split.py [--blocks 64,128,256]
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
import numpy as np

N, MT, TRAITS = 10_000, 20_000, 4
WARM, MEAS, REPEATS = 2, 10, 3


def time_step(step, state, static):
    it = 1
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
    K = cva.shape[1]
    return BlockScanResult(
        dbeta_eff=d, beta_new=beta_old + d, comp_new=comp_old,
        acum_new=acum_old + d,
        cass_inc=jnp.zeros((c.shape[0],) + cva.shape, jnp.int32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="64,128,256")
    ap.add_argument("--trace", action="store_true",
                    help="also dump a jax.profiler trace of the full step")
    args = ap.parse_args()
    blocks = [int(b) for b in args.blocks.split(",")]

    sys.path.insert(0, REPO)
    from bench import build_dataset
    from gmrm_tpu.config import Options
    from gmrm_tpu.runner import load_data, build_static, init_sampler_state
    from gmrm_tpu.sampler.gibbs import make_gibbs_step
    import gmrm_tpu.ops.scan_kernel as sk
    import gmrm_tpu.ops.scan_kernel_v3 as sk3

    data_dir = build_dataset()
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    print(f"# backend = {backend}", file=sys.stderr, flush=True)

    rows = []
    v1_impl = sk.block_scan_pallas
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
        state = init_sampler_state(data, opt, jnp.float32)
        shared_na = all(ph.nas == 0 for ph in data.phens)

        variants = {}
        mk = lambda use_pallas: make_gibbs_step(   # noqa: E731
            block_size=B, use_pallas=use_pallas, donate=False,
            shared_na=shared_na)

        sk.block_scan_pallas = v1_impl
        variants["full(v1)"] = time_step(mk(on_tpu), state, static)
        if on_tpu:
            sk.block_scan_pallas = sk3.block_scan_pallas
            variants["v3"] = time_step(mk(True), state, static)
            sk.block_scan_pallas = v1_impl
        variants["xla-scan"] = time_step(mk(False), state, static)
        sk.block_scan_pallas = null_scan
        variants["null-scan"] = time_step(mk(on_tpu), state, static)
        sk.block_scan_pallas = v1_impl

        for name, tsec in variants.items():
            rows.append((B, name, tsec * 1000))
            print(f"# B={B:4d} {name:10s} {tsec * 1000:8.2f} ms/iter",
                  file=sys.stderr, flush=True)

    lines = [
        "# Iteration time decomposition (real-device A/B)",
        "",
        f"Backend: {backend}.  Workload: N={N}, Mt={MT}, T={TRAITS} "
        f"(the bench anchor).  Best of {REPEATS}x{MEAS} timed iterations.",
        "",
        "| block | variant | ms/iter | markers/s |",
        "|---|---|---|---|",
    ]
    for B, name, ms in rows:
        lines.append(f"| {B} | {name} | {ms:.2f} | {MT / ms * 1000:,.0f} |")
    lines += [
        "",
        "`full - null-scan` approximates the serial scan's share; "
        "`null-scan` carries the Gram + eps-update matmuls + permute.",
        "",
    ]
    with open(os.path.join(HERE, "PROFILE.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))

    if args.trace and on_tpu:
        tdir = "/tmp/gmrm_profile_trace"
        opt = Options(
            bed_file=f"{data_dir}/test.bed", dim_file=f"{data_dir}/test.dim",
            phen_files=[f"{data_dir}/test{i + 1}.phen" for i in range(TRAITS)],
            group_index_file=f"{data_dir}/test.gri",
            group_mixture_file=f"{data_dir}/test.grm",
            iterations=1, seed=42, block_size=blocks[0],
            output_thin_rate=10 ** 9,
        )
        opt.validate()
        opt.load_group_mixtures()
        data = load_data(opt)
        static = build_static(data, opt, jnp.float32)
        state = init_sampler_state(data, opt, jnp.float32)
        step = make_gibbs_step(block_size=blocks[0], use_pallas=True,
                               donate=False,
                               shared_na=all(p.nas == 0 for p in data.phens))
        state, _ = step(state, static, jnp.asarray(1, jnp.int32))
        jax.block_until_ready(state.sigmae)
        with jax.profiler.trace(tdir):
            state, _ = step(state, static, jnp.asarray(2, jnp.int32))
            jax.block_until_ready(state.sigmae)
        print(f"# trace written to {tdir}", file=sys.stderr)


if __name__ == "__main__":
    main()
