"""Pallas TPU kernel for the within-block serial Gibbs scan.

The XLA ``lax.scan`` version (gmrm_tpu.sampler.scan.block_scan) pays ~10us
of loop overhead per marker step, which dominates the whole sampler (a
20k-marker sweep spends ~200ms in loop overhead vs ~6ms of Gram matmuls).
This kernel runs the entire B-step recursion inside one ``pallas_call``
with every operand VMEM-resident.

Design (two levels):

1. Everything that does not depend on the serial ``num`` recursion is
   precomputed OUTSIDE the kernel, vectorized over the whole block at full
   VPU width: the likelihood constants ``lc = log pi - 0.5 log(...)``, the
   reciprocal denominators ``rd = 1/denom``, the draw scales
   ``sqb = sqrt(sigmae/denom)``, the ``base = c + beta_old (nonas-1)``
   term, and the adaV/validity masks.  The per-step body is left with only
   num-dependent work.
2. The reference's sequential CDF walk (``src/bayes.cpp:435-477``) is
   reformulated branchlessly: all K partial normalizers
   ``s_i = 1/sum_k exp(logl_k - logl_i)`` (with the per-step overflow
   guard ``any_{k>=i} |logl_k - logl_i| > 700 -> s_i = 0``) are computed
   at once from the (K, K) difference table, the CDF is their prefix sum
   in the same accumulation order as the serial walk, and the component is
   the first index with ``u <= cdf`` (else K-1) — provably the same choice
   the walk makes.

The serial interaction term is maintained *incrementally*: a running
correction buffer ``corr[i] += dbeta_j * gs[j, i]`` (one (B, T) FMA per
step, skipped when dbeta == 0) replaces the per-step dot product.

Layout: the marker axis B lives on SUBLANES (dynamic indexing is legal
there; Mosaic forbids dynamic lane slices), the trait axis T on LANES — so
multi-trait batching up to 128 traits rides free.

Semantics are identical to block_scan (the reference recursion
``src/bayes.cpp:391-492``); tests cross-check component choices exactly
(tests/test_scan_kernel.py, interpret mode).

Shape conventions (wrapper transposes from the sampler's (T, ...) forms):
  base, beta_old, acum_old, u, z, live, zerob, outs: (B, T)
  lc, rd, sqb:               (B, K, T) f32
  gs_t:                      (B, B, T) f32   gs_t[j, i, t] = G_std[t, j, i]
  inv2sige:                  (1, T)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmrm_tpu.ops.pallas_kernels import (
    out_vma, resolve_interpret, sds, shard_varying,
)
from gmrm_tpu.sampler.scan import BlockScanResult


def _scan_kernel(
    # VMEM inputs
    base_ref, lc_ref, rd_ref, sqb_ref, gs_ref,
    beta_old_ref, comp_old_ref, acum_old_ref,
    u_ref, z_ref, live_ref, zerob_ref, inv2sige_ref,
    # outputs
    dbeta_ref, beta_new_ref, comp_new_ref, acum_new_ref,
    # scratch
    corr_ref,
    *, n_mix: int,
):
    B, T = base_ref.shape
    K = n_mix

    i2se = inv2sige_ref[:, :]                      # (1, T)
    corr_ref[:, :] = jnp.zeros((B, T), jnp.float32)
    krow = jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)

    def step(j, _):
        num = base_ref[pl.ds(j, 1), :] + corr_ref[pl.ds(j, 1), :]   # (1, T)
        muk = num * rd_ref[j]                                       # (K, T)
        logl = lc_ref[j] + muk * (num * i2se)                       # (K, T)

        # Branchless CDF walk, unrolled over the K mixture slots (K is a
        # small static constant; all ops stay 2D for Mosaic).
        rows = []
        prev = None
        for i in range(K):
            d_i = logl - logl[i:i + 1, :]                           # (K, T)
            # The reference checks slabs from i onward for overflow.
            guard_i = jnp.any((krow >= i) & (jnp.abs(d_i) > 700.0),
                              axis=0, keepdims=True)                # (1, T)
            esum_i = jnp.sum(jnp.exp(d_i), axis=0, keepdims=True)
            s_i = jnp.where(guard_i, 0.0, 1.0 / esum_i)
            prev = s_i if prev is None else prev + s_i
            rows.append(prev)
        cdf = jnp.concatenate(rows, axis=0)                         # (K, T)

        u_j = u_ref[pl.ds(j, 1), :]                                 # (1, T)
        cmp = u_j <= cdf                                            # (K, T)
        comp = jnp.min(jnp.where(cmp, krow, K - 1), axis=0,
                       keepdims=True)                               # (1, T)
        onehot_c = krow == comp                                     # (K, T)
        acum = jnp.sum(jnp.where(onehot_c, cdf, 0.0), axis=0,
                       keepdims=True)
        muk_sel = jnp.sum(jnp.where(onehot_c, muk, 0.0), axis=0,
                          keepdims=True)
        sqb_sel = jnp.sum(jnp.where(onehot_c, sqb_ref[j], 0.0), axis=0,
                          keepdims=True)
        z_j = z_ref[pl.ds(j, 1), :]
        beta_sampled = jnp.where(comp == 0, 0.0, muk_sel + sqb_sel * z_j)

        live_j = live_ref[pl.ds(j, 1), :] != 0                      # (1, T)
        zerob_j = zerob_ref[pl.ds(j, 1), :] != 0
        beta_old_j = beta_old_ref[pl.ds(j, 1), :]
        beta_new_ref[pl.ds(j, 1), :] = jnp.where(
            live_j, beta_sampled, jnp.where(zerob_j, 0.0, beta_old_j))
        comp_new_ref[pl.ds(j, 1), :] = jnp.where(
            live_j, comp, comp_old_ref[pl.ds(j, 1), :])
        acum_new_ref[pl.ds(j, 1), :] = jnp.where(
            live_j, acum, jnp.where(zerob_j, 1.0,
                                    acum_old_ref[pl.ds(j, 1), :]))

        dbeta_j = jnp.where(live_j, beta_old_j - beta_sampled, 0.0)
        dbeta_ref[pl.ds(j, 1), :] = dbeta_j

        # Propagate this marker's move into every later marker's num via a
        # single rank-1 FMA on the running correction buffer.
        @pl.when(jnp.any(dbeta_j != 0.0))
        def _():
            corr_ref[:, :] = corr_ref[:, :] + gs_ref[j] * dbeta_j

        return 0

    jax.lax.fori_loop(0, B, step, 0)


@functools.lru_cache(maxsize=64)
def _build_call(T, B, K, interpret, vma=None):
    kern = functools.partial(_scan_kernel, n_mix=K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[pltpu.VMEM((B, T), jnp.float32)],
    )
    out_shape = [
        sds((B, T), jnp.float32, vma),      # dbeta
        sds((B, T), jnp.float32, vma),      # beta_new
        sds((B, T), jnp.int32, vma),        # comp_new
        sds((B, T), jnp.float32, vma),      # acum_new
    ]
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )


def block_scan_pallas(
    c, gs, beta_old, comp_old, acum_old, grp, valid, u, z,
    sigmag, sigmae, pi_est, cva, cvai, nonas, n_total,
    axis_name=None, interpret=False,
) -> BlockScanResult:
    """Drop-in replacement for sampler.scan.block_scan (same argument
    meanings).  Precomputes all num-independent quantities vectorized over
    the block, runs the serial recursion in one kernel, and accumulates
    cass afterwards in XLA."""
    T, B = c.shape
    G, K = cva.shape
    f32 = jnp.float32

    c = c.astype(f32)
    beta_old_f = beta_old.astype(f32)
    sigmae_f = sigmae.astype(f32)[:, None]                 # (T, 1)
    nonas_f = nonas.astype(f32)[:, None]                   # (T, 1)
    n_total_f = jnp.asarray(n_total, f32)

    sg = jnp.take_along_axis(
        sigmag.astype(f32), grp[None, :], axis=1)          # (T, B)
    adav = sg == 0.0
    sg_safe = jnp.where(adav, 1.0, sg)
    sige_g = sigmae_f / sg_safe                            # (T, B)
    sigg_e = sg_safe / sigmae_f

    cvai_b = cvai.astype(f32)[grp, 1:]                     # (B, K-1)
    cva_b = cva.astype(f32)[grp, 1:]
    denom = (n_total_f - 1.0) + sige_g[:, :, None] * cvai_b[None]  # (T,B,K-1)
    zeros0 = jnp.zeros((T, B, 1), f32)
    rd = jnp.concatenate([zeros0, 1.0 / denom], axis=2)    # (T, B, K)
    sqb = jnp.concatenate(
        [zeros0, jnp.sqrt(sigmae_f[:, :, None] / denom)], axis=2)

    logpi = jnp.log(pi_est.astype(f32))[:, grp, :]         # (T, B, K)
    tail_c = -0.5 * jnp.log(
        sigg_e[:, :, None] * (nonas_f[:, :, None] - 1.0) * cva_b[None] + 1.0)
    lc = logpi.at[:, :, 1:].add(tail_c)

    base = c + beta_old_f * (nonas_f - 1.0)                # (T, B)
    validb = valid[None, :]                                # (1, B)
    live = (validb & (~adav)).astype(jnp.int32)            # (T, B)
    zerob = (validb & adav).astype(jnp.int32)

    call = _build_call(T, B, K, resolve_interpret(interpret),
                       out_vma(axis_name))
    outs = call(*shard_varying(
        axis_name,
        base.T,
        jnp.transpose(lc, (1, 2, 0)),                      # (B, K, T)
        jnp.transpose(rd, (1, 2, 0)),
        jnp.transpose(sqb, (1, 2, 0)),
        jnp.transpose(gs, (1, 2, 0)).astype(f32),          # (B, B, T), [j,i,t]
        beta_old_f.T, comp_old.astype(jnp.int32).T,
        acum_old.astype(f32).T, u.astype(f32).T, z.astype(f32).T,
        live.T, zerob.T,
        (1.0 / (2.0 * sigmae_f)).reshape(1, T),
    ))
    dbeta, beta_new, comp_new, acum_new = outs

    # cass increment, vectorized in XLA (one tiny fused op per block).
    onehot_k = jax.nn.one_hot(comp_new.T, K, dtype=jnp.int32)   # (T, B, K)
    onehot_g = jax.nn.one_hot(grp, G, dtype=jnp.int32)          # (B, G)
    cass_inc = jnp.einsum(
        "tbk,bg->tgk", onehot_k * live[:, :, None], onehot_g)

    return BlockScanResult(
        dbeta_eff=dbeta.T.astype(c.dtype),
        beta_new=beta_new.T.astype(c.dtype),
        comp_new=comp_new.T,
        acum_new=acum_new.T.astype(c.dtype),
        cass_inc=cass_inc,
    )
