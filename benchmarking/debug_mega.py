"""Localize the mega-vs-composed divergence on the real device.

One iteration from the same state; count comp mismatches, inspect beta
agreement on markers whose comp matched, and per-trait eps deltas.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gmrm_jax_cache")
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_dataset, N, MT, TRAITS
from gmrm_tpu.config import Options
from gmrm_tpu.runner import load_data, build_static, init_sampler_state
from gmrm_tpu.sampler.gibbs import make_gibbs_step

WAVE, BLOCK = 16, 128

data_dir = build_dataset()
opt = Options(
    bed_file=f"{data_dir}/test.bed", dim_file=f"{data_dir}/test.dim",
    phen_files=[f"{data_dir}/test{i+1}.phen" for i in range(TRAITS)],
    group_index_file=f"{data_dir}/test.gri",
    group_mixture_file=f"{data_dir}/test.grm",
    iterations=1, seed=42, block_size=BLOCK, wave_size=WAVE,
    output_thin_rate=100_000,
)
opt.validate()
opt.load_group_mixtures()
data = load_data(opt)
static = build_static(data, opt, jnp.float32)
state0 = init_sampler_state(data, opt, jnp.float32)
shared_na = all(ph.nas == 0 for ph in data.phens)
print(f"# backend={jax.default_backend()}", flush=True)

step_c = make_gibbs_step(block_size=BLOCK, use_pallas=True, donate=False,
                         shared_na=shared_na, wave_size=WAVE, megakernel=False)
step_m = make_gibbs_step(block_size=BLOCK, use_pallas=True, donate=False,
                         shared_na=shared_na, wave_size=WAVE, megakernel=True)

it = jnp.asarray(1, jnp.int32)
s_a, _ = step_c(state0, static, it)
s_b, _ = step_m(state0, static, it)
s_a, s_b = jax.device_get((s_a, s_b))

comp_a = np.asarray(s_a.comp)
comp_b = np.asarray(s_b.comp)
beta_a = np.asarray(s_a.betas)
beta_b = np.asarray(s_b.betas)
mism = comp_a != comp_b
print(f"comp mismatches: {mism.sum()} / {comp_a.size}")
if mism.sum():
    idx = np.argwhere(mism)[:10]
    print("first mismatch coords (trait, marker):", idx.tolist())
    t0, m0 = idx[0]
    print(f"  comp a={comp_a[t0, m0]} b={comp_b[t0, m0]} "
          f"beta a={beta_a[t0, m0]:.5f} b={beta_b[t0, m0]:.5f}")
    # which block does the first mismatch live in (after permute it's
    # iteration-dependent; raw marker index mod B is still informative)
    print(f"  marker {m0}: block-of-raw {m0 // BLOCK}")
agree = ~mism
if agree.any():
    d_beta = np.abs(beta_a - beta_b)[agree]
    print(f"on agreeing markers: max|dbeta|={d_beta.max():.3e} "
          f"mean={d_beta.mean():.3e}")
else:
    print("no agreeing markers — every comp mismatches")
d_eps = np.abs(np.asarray(s_a.eps) - np.asarray(s_b.eps))
print(f"eps: max={d_eps.max():.3e} per-trait max={d_eps.reshape(TRAITS, -1).max(1)}")
print(f"sigmae a={np.asarray(s_a.sigmae)} b={np.asarray(s_b.sigmae)}")
print(f"mu a={np.asarray(s_a.mu)} b={np.asarray(s_b.mu)}")
