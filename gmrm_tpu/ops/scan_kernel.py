"""Pallas TPU kernel for the within-block serial Gibbs scan.

The XLA ``lax.scan`` version (gmrm_tpu.sampler.scan.block_scan) pays ~10us
of loop overhead per marker step, which dominates the whole sampler (a
20k-marker sweep spends ~200ms in loop overhead vs ~6ms of Gram matmuls).
This kernel runs the entire B-step recursion inside one ``pallas_call``
with every operand VMEM-resident.

Layout: the marker axis B lives on SUBLANES (dynamic indexing is legal
there; Mosaic forbids dynamic lane slices), the trait axis T on LANES — so
multi-trait batching up to 128 traits rides free.  The serial interaction
term is maintained *incrementally*: a running correction buffer
``corr[i] += dbeta_j * gs[j, i]`` (one (B, T) FMA per step) replaces the
per-step dot product, so a step is ~25 tiny VPU ops plus one (B, T) FMA.

Semantics are identical to block_scan (the reference recursion
``src/bayes.cpp:391-492``); tests cross-check component choices exactly.

Shape conventions (wrapper transposes from the sampler's (T, ...) forms):
  c, beta_old, acum_old, u, z, dbeta/beta/acum outs: (B, T) f32
  comp_old / comp out:       (B, T) i32
  gs_t:                      (B, B, T) f32   gs_t[j, i, t] = G_std[t, j, i]
  grp, valid:                (B,) i32 (scalar prefetch, SMEM)
  sigmag: (G, T); sigmae, nonas: (1, T); pi_est: (G*K, T)
  cva, cvai: (G*K, 1); n_total: (1, 1)
  cass out: (G*K, T) i32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmrm_tpu.sampler.scan import BlockScanResult


def _scan_kernel(
    # scalar prefetch (SMEM)
    grp_ref, valid_ref,
    # VMEM inputs
    c_ref, gs_ref, beta_old_ref, comp_old_ref, acum_old_ref,
    u_ref, z_ref, sigmag_ref, sigmae_ref, pi_ref, cva_ref, cvai_ref,
    nonas_ref, n_total_ref,
    # outputs
    dbeta_ref, beta_new_ref, comp_new_ref, acum_new_ref, cass_ref,
    # scratch
    corr_ref,
    *, n_mix: int, n_grp: int,
):
    B, T = c_ref.shape
    K, G = n_mix, n_grp

    sigmae = sigmae_ref[:, :]                  # (1, T)
    nonas = nonas_ref[:, :]                    # (1, T)
    inv2sige = 1.0 / (2.0 * sigmae)
    n_total = n_total_ref[:, :]                # (1, 1)

    cass_ref[:, :] = jnp.zeros((G * K, T), jnp.int32)
    corr_ref[:, :] = jnp.zeros((B, T), jnp.float32)
    krow = jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)

    def step(j, _):
        grp_j = grp_ref[j]
        valid_j = valid_ref[j] != 0

        sg = sigmag_ref[pl.ds(grp_j, 1), :]                # (1, T)
        adav = sg == 0.0
        sg_safe = jnp.where(adav, 1.0, sg)
        sige_g = sigmae / sg_safe
        sigg_e = sg_safe / sigmae

        c_j = c_ref[pl.ds(j, 1), :]                        # (1, T)
        beta_old_j = beta_old_ref[pl.ds(j, 1), :]
        num = c_j + corr_ref[pl.ds(j, 1), :] \
            + beta_old_j * (nonas - 1.0)                   # (1, T)

        cvai_g = cvai_ref[pl.ds(grp_j * K, K), :]          # (K, 1)
        cva_g = cva_ref[pl.ds(grp_j * K, K), :]            # (K, 1)
        # denom row k pairs slab k (row 0 = N-1, unused: muk row 0 = 0).
        denom = (n_total - 1.0) + sige_g * cvai_g          # (K, T)
        muk = jnp.where(krow == 0, 0.0, num / denom)       # (K, T)

        pi_g = pi_ref[pl.ds(grp_j * K, K), :]              # (K, T)
        logl = jnp.log(pi_g)
        tail = (-0.5 * jnp.log(sigg_e * (nonas - 1.0) * cva_g + 1.0)
                + muk * num * inv2sige)
        logl = jnp.where(krow == 0, logl, logl + tail)

        u_j = u_ref[pl.ds(j, 1), :]                        # (1, T)
        l0 = logl[0:1, :]
        over0 = jnp.any(jnp.abs(logl - l0) > 700.0, axis=0, keepdims=True)
        acum = jnp.where(
            over0, 0.0,
            1.0 / jnp.sum(jnp.exp(logl - l0), axis=0, keepdims=True))
        comp = jnp.full((1, T), K - 1, jnp.int32)
        chosen = jnp.zeros((1, T), jnp.bool_)
        for i in range(K):
            sel = (~chosen) & ((u_j <= acum) | (i == K - 1))
            comp = jnp.where(sel, i, comp)
            chosen = chosen | sel
            if i < K - 1:
                ref_l = logl[i + 1:i + 2, :]
                zero_inc = jnp.any(
                    (krow >= i + 1) & (jnp.abs(logl - ref_l) > 700.0),
                    axis=0, keepdims=True)
                esum = jnp.sum(jnp.exp(logl - ref_l), axis=0, keepdims=True)
                inc = jnp.where(zero_inc, 0.0, 1.0 / esum)
                acum = jnp.where(chosen, acum, acum + inc)

        onehot_c = krow == comp                            # (K, T)
        muk_sel = jnp.sum(jnp.where(onehot_c, muk, 0.0), axis=0,
                          keepdims=True)                   # (1, T)
        denom_sel = jnp.sum(jnp.where(onehot_c, denom, 0.0), axis=0,
                            keepdims=True)
        denom_sel = jnp.where(denom_sel == 0.0, 1.0, denom_sel)
        z_j = z_ref[pl.ds(j, 1), :]
        beta_drawn = muk_sel + jnp.sqrt(sigmae / denom_sel) * z_j
        beta_sampled = jnp.where(comp == 0, 0.0, beta_drawn)

        live = valid_j & (~adav)                           # (1, T)
        comp_old_j = comp_old_ref[pl.ds(j, 1), :]
        acum_old_j = acum_old_ref[pl.ds(j, 1), :]
        beta_new_ref[pl.ds(j, 1), :] = jnp.where(
            valid_j, jnp.where(adav, 0.0, beta_sampled), beta_old_j)
        comp_new_ref[pl.ds(j, 1), :] = jnp.where(live, comp, comp_old_j)
        acum_new_ref[pl.ds(j, 1), :] = jnp.where(
            valid_j, jnp.where(adav, 1.0, acum), acum_old_j)

        dbeta_j = jnp.where(live, beta_old_j - beta_sampled, 0.0)  # (1, T)
        dbeta_ref[pl.ds(j, 1), :] = dbeta_j

        # Propagate this marker's move into every later marker's num via a
        # single rank-1 FMA on the running correction buffer.
        @pl.when(jnp.any(dbeta_j != 0.0))
        def _():
            corr_ref[:, :] = corr_ref[:, :] + gs_ref[j] * dbeta_j

        gk = jax.lax.broadcasted_iota(jnp.int32, (G * K, T), 0)
        hit = (gk == grp_j * K + comp) & live
        cass_ref[:, :] = cass_ref[:, :] + hit.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, B, step, 0)


@functools.lru_cache(maxsize=64)
def _build_call(T, B, G, K, interpret):
    kern = functools.partial(_scan_kernel, n_mix=K, n_grp=G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        scratch_shapes=[pltpu.VMEM((B, T), jnp.float32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, T), jnp.float32),      # dbeta
        jax.ShapeDtypeStruct((B, T), jnp.float32),      # beta_new
        jax.ShapeDtypeStruct((B, T), jnp.int32),        # comp_new
        jax.ShapeDtypeStruct((B, T), jnp.float32),      # acum_new
        jax.ShapeDtypeStruct((G * K, T), jnp.int32),    # cass_inc
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
    meanings; transposes into the kernel's marker-major layout)."""
    T, B = c.shape
    G, K = cva.shape
    f32 = jnp.float32

    call = _build_call(T, B, G, K, interpret)
    outs = call(
        grp.astype(jnp.int32), valid.astype(jnp.int32),
        c.T.astype(f32),
        jnp.transpose(gs, (1, 2, 0)).astype(f32),        # (B, B, T), [j,i,t]
        beta_old.T.astype(f32), comp_old.T.astype(jnp.int32),
        acum_old.T.astype(f32), u.T.astype(f32), z.T.astype(f32),
        sigmag.T.astype(f32),                            # (G, T)
        sigmae.reshape(1, T).astype(f32),
        pi_est.reshape(T, G * K).T.astype(f32),          # (G*K, T)
        cva.reshape(G * K, 1).astype(f32),
        cvai.reshape(G * K, 1).astype(f32),
        nonas.reshape(1, T).astype(f32),
        jnp.asarray(n_total, f32).reshape(1, 1),
    )
    dbeta, beta_new, comp_new, acum_new, cass_flat = outs
    return BlockScanResult(
        dbeta_eff=dbeta.T.astype(c.dtype),
        beta_new=beta_new.T.astype(c.dtype),
        comp_new=comp_new.T,
        acum_new=acum_new.T.astype(c.dtype),
        cass_inc=cass_flat.T.reshape(T, G, K),
    )
