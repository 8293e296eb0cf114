"""Speculative prefix-acceptance Pallas kernel for the within-block scan.

The serial-scan kernel (gmrm_tpu.ops.scan_kernel) pays ~0.5 us per marker
step — 70% of the whole Gibbs iteration (benchmarking/PROFILE.md).  But the
recursion only actually couples markers through NONZERO moves: marker j's
``num_j = c_j + sum_{i<j} gs[j,i] * dbeta_i`` changes only when some
earlier marker produced ``dbeta != 0``, and after burn-in only ~m0/M of
markers do (a few percent; reference spike-and-slab semantics,
src/bayes.cpp:435-477).

So instead of B serial steps, run *speculative rounds*:

1. compute candidate draws for ALL B markers at once, vectorized, using
   the corrections accumulated so far;
2. per trait, the candidates at markers [pos, jstar] are EXACT, where
   jstar is the first marker at-or-after pos with a nonzero candidate
   dbeta (markers before it contribute nothing, and jstar itself saw all
   earlier corrections) — accept them;
3. fold jstar's rank-1 correction ``corr += dbeta_jstar * gs[jstar, :]``
   and continue from jstar + 1.

Expected rounds per block = nonzero moves + 1 (worst case B, identical
semantics).  The accumulation ORDER of corrections matches the serial
kernel exactly (one correction per nonzero move, in marker order), so the
draws are bit-identical to gmrm_tpu.ops.scan_kernel / sampler.scan up to
the shared float model.

Layout: trait axis T on SUBLANES, marker axis B on LANES — every (T, B)
elementwise op is a single VREG for B <= 128.  Per-trait prefix positions
ride the while-loop carry as unrolled scalars; gs rows are fetched with a
dynamic sublane slice (legal on TPU; dynamic LANE slicing is not).
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


def _spec_kernel(
    # VMEM inputs
    base_ref,        # (T, B) f32
    lc_ref,          # (K, T, B) f32
    rd_ref,          # (K, T, B) f32
    sqb_ref,         # (K, T, B) f32
    gs_ref,          # (B, T, B) f32: [j, t, i] = gs[t, j, i]
    beta_old_ref,    # (T, B) f32
    comp_old_ref,    # (T, B) i32
    acum_old_ref,    # (T, B) f32
    u_ref, z_ref,    # (T, B) f32
    live_ref,        # (T, B) i32
    zerob_ref,       # (T, B) i32
    i2se_ref,        # (T, 1) f32
    # outputs
    dbeta_ref, beta_new_ref, comp_new_ref, acum_new_ref,   # (T, B)
    # scratch
    corr_ref,        # (T, B) f32
    *, n_mix: int, n_traits: int,
):
    T, B = base_ref.shape
    K = n_mix

    live = live_ref[:, :] != 0
    zerob = zerob_ref[:, :] != 0
    beta_old = beta_old_ref[:, :]
    u = u_ref[:, :]
    z = z_ref[:, :]
    i2se = i2se_ref[:, :]                                    # (T, 1)
    base = base_ref[:, :]

    # Non-accepted fallbacks, written once (adaV zeroing / pad passthrough,
    # bayes.cpp:396-400).
    zf = jnp.zeros((T, B), jnp.float32)
    dbeta_ref[:, :] = zf
    beta_new_ref[:, :] = jnp.where(zerob, 0.0, beta_old)
    comp_new_ref[:, :] = comp_old_ref[:, :]
    acum_new_ref[:, :] = jnp.where(zerob, 1.0, acum_old_ref[:, :])
    corr_ref[:, :] = zf

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)    # marker index
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    def cond(pos):
        m = pos[0]
        for t in range(1, n_traits):
            m = jnp.minimum(m, pos[t])
        return m < B

    def body(pos):
        num = base + corr_ref[:, :]                          # (T, B)
        ni = num * i2se
        muk = [num * rd_ref[k] for k in range(K)]
        logl = [lc_ref[k] + muk[k] * ni for k in range(K)]

        # Sequential CDF walk, vectorized over the block (exact reference
        # semantics incl. the |dlogl| > 700 guards, bayes.cpp:435-477).
        cdf = []
        prev = None
        for i in range(K):
            guard = None
            esum = None
            for k2 in range(K):
                d = logl[k2] - logl[i]
                e = jnp.exp(d)
                esum = e if esum is None else esum + e
                if k2 >= i:
                    g = jnp.abs(d) > 700.0
                    guard = g if guard is None else guard | g
            s_i = jnp.where(guard, 0.0, 1.0 / esum)
            prev = s_i if prev is None else prev + s_i
            cdf.append(prev)

        comp = jnp.full((T, B), K - 1, jnp.int32)
        for i in range(K - 1, -1, -1):
            comp = jnp.where(u <= cdf[i], i, comp)
        acum_sel = cdf[K - 1]
        muk_sel = muk[K - 1]
        sqb_sel = sqb_ref[K - 1]
        for i in range(K - 2, -1, -1):
            is_i = comp == i
            acum_sel = jnp.where(is_i, cdf[i], acum_sel)
            muk_sel = jnp.where(is_i, muk[i], muk_sel)
            sqb_sel = jnp.where(is_i, sqb_ref[i], sqb_sel)

        beta_samp = jnp.where(comp == 0, 0.0, muk_sel + sqb_sel * z)
        dbeta_cand = jnp.where(live, beta_old - beta_samp, 0.0)

        # Per-trait first nonzero at-or-after pos, prefix acceptance.
        new_pos = []
        accept_rows = []
        for t in range(n_traits):
            pos_t = pos[t]
            nz_t = (dbeta_cand[t:t + 1, :] != 0.0) & (lane1 >= pos_t)
            jstar_t = jnp.min(jnp.where(nz_t, lane1, B))     # scalar
            # int32 rows: Mosaic cannot concatenate i1 vectors.
            accept_rows.append(
                ((lane1 >= pos_t) & (lane1 <= jstar_t)).astype(jnp.int32))

            @pl.when(jstar_t < B)
            def _():
                row = gs_ref[pl.ds(jstar_t, 1), t, :]        # (1, B)
                dbj = jnp.sum(jnp.where(lane1 == jstar_t,
                                        dbeta_cand[t:t + 1, :], 0.0))
                corr_ref[t:t + 1, :] = corr_ref[t:t + 1, :] + dbj * row

            new_pos.append(jnp.minimum(jstar_t + 1, B))

        accept = (jnp.concatenate(accept_rows, axis=0) != 0) & live  # (T, B)
        dbeta_ref[:, :] = jnp.where(accept, dbeta_cand, dbeta_ref[:, :])
        beta_new_ref[:, :] = jnp.where(accept, beta_samp, beta_new_ref[:, :])
        comp_new_ref[:, :] = jnp.where(accept, comp, comp_new_ref[:, :])
        acum_new_ref[:, :] = jnp.where(accept, acum_sel, acum_new_ref[:, :])
        return tuple(new_pos)

    jax.lax.while_loop(cond, body,
                       tuple(jnp.asarray(0, jnp.int32)
                             for _ in range(n_traits)))


@functools.lru_cache(maxsize=64)
def _build_call(T, B, K, interpret, vma=None):
    kern = functools.partial(_spec_kernel, n_mix=K, n_traits=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[pltpu.VMEM((T, B), jnp.float32)],
    )
    out_shape = [
        sds((T, B), jnp.float32, vma),      # dbeta
        sds((T, B), jnp.float32, vma),      # beta_new
        sds((T, B), jnp.int32, vma),        # comp_new
        sds((T, B), jnp.float32, vma),      # acum_new
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
    meanings, same precomputation split as ops.scan_kernel)."""
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
    sige_g = sigmae_f / sg_safe
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
        base,
        jnp.transpose(lc, (2, 0, 1)),                      # (K, T, B)
        jnp.transpose(rd, (2, 0, 1)),
        jnp.transpose(sqb, (2, 0, 1)),
        jnp.transpose(gs, (1, 0, 2)).astype(f32),          # (B, T, B) [j,t,i]
        beta_old_f, comp_old.astype(jnp.int32),
        acum_old.astype(f32), u.astype(f32), z.astype(f32),
        live, zerob,
        (1.0 / (2.0 * sigmae_f)),                          # (T, 1)
    ))
    dbeta, beta_new, comp_new, acum_new = outs

    onehot_k = jax.nn.one_hot(comp_new, K, dtype=jnp.int32)     # (T, B, K)
    onehot_g = jax.nn.one_hot(grp, G, dtype=jnp.int32)          # (B, G)
    cass_inc = jnp.einsum(
        "tbk,bg->tgk", onehot_k * live[:, :, None], onehot_g)

    return BlockScanResult(
        dbeta_eff=dbeta.astype(c.dtype),
        beta_new=beta_new.astype(c.dtype),
        comp_new=comp_new,
        acum_new=acum_new.astype(c.dtype),
        cass_inc=cass_inc,
    )
