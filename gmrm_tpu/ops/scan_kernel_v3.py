"""Experimental v3 of the within-block scan kernel (packed IO + softmax).

Same sublane-major layout as gmrm_tpu.ops.scan_kernel (marker axis B on
sublanes, traits on lanes), with two changes:

1. Per-marker operands are packed into one (B, 8, T) array and results
   into one (B, 4, T) array, so each step issues ONE dynamic sublane
   slice and ONE dynamic store instead of ~12.
2. The CDF walk uses a single guarded softmax: with e = exp(logl - max)
   and S = sum(e), the walk's partial normalizers are s_i = e_i / S
   (algebraically equal to 1/sum_k exp(logl_k - logl_i)), each zeroed by
   the reference guard any_{k>=i} |logl_k - logl_i| > 700 evaluated from
   sublane-wise suffix max/min — one exp per step instead of K.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmrm_tpu.sampler.scan import BlockScanResult

_CH = 8   # in-pack channels: base u z beta_old comp_old acum_old live zerob


def _scan_kernel(
    in_ref,      # (B, 8, T) f32
    kp_ref,      # (B, 3K, T) f32  [lc | rd | sqb]
    gs_ref,      # (B, B, T) f32
    i2se_ref,    # (1, T) f32
    out_ref,     # (B, 4, T) f32  [dbeta beta_new comp_new acum_new]
    corr_ref,    # (B, T) f32 scratch
    *, n_mix: int,
):
    B, _, T = in_ref.shape
    K = n_mix

    i2se = i2se_ref[:, :]                                  # (1, T)
    corr_ref[:, :] = jnp.zeros((B, T), jnp.float32)
    krow = jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)

    def step(j, _):
        inj = in_ref[j]                                    # (8, T)
        base = inj[0:1]
        u_j = inj[1:2]
        z_j = inj[2:3]
        beta_old_j = inj[3:4]
        comp_old_j = inj[4:5]
        acum_old_j = inj[5:6]
        live_j = inj[6:7] != 0.0
        zerob_j = inj[7:8] != 0.0

        kp = kp_ref[j]                                     # (3K, T)
        lc = kp[:K]
        rd = kp[K:2 * K]
        sqb = kp[2 * K:3 * K]

        num = base + corr_ref[pl.ds(j, 1), :]              # (1, T)
        muk = num * rd                                     # (K, T)
        logl = lc + muk * (num * i2se)                     # (K, T)

        # Reference guards: guard_i = any_{k>=i} |logl_k - logl_i| > 700,
        # via sublane-wise suffix max/min (K is small and static).
        rows = [logl[i:i + 1] for i in range(K)]
        smax = [None] * K
        smin = [None] * K
        smax[K - 1] = rows[K - 1]
        smin[K - 1] = rows[K - 1]
        for i in range(K - 2, -1, -1):
            smax[i] = jnp.maximum(rows[i], smax[i + 1])
            smin[i] = jnp.minimum(rows[i], smin[i + 1])
        suffmax = jnp.concatenate(smax, axis=0)            # (K, T)
        suffmin = jnp.concatenate(smin, axis=0)
        guard = (suffmax - logl > 700.0) | (logl - suffmin > 700.0)

        # Guarded softmax prefix sum: s_i = e_i / S.
        mx = jnp.max(logl, axis=0, keepdims=True)          # (1, T)
        e = jnp.exp(logl - mx)
        s_all = jnp.sum(e, axis=0, keepdims=True)
        eg = jnp.where(guard, 0.0, e)
        prows = [eg[0:1]]
        for i in range(1, K):
            prows.append(prows[-1] + eg[i:i + 1])
        cdf = jnp.concatenate(prows, axis=0) / s_all       # (K, T)

        comp = jnp.min(jnp.where(u_j <= cdf, krow, K - 1), axis=0,
                       keepdims=True)                      # (1, T)
        onehot_c = krow == comp                            # (K, T)
        acum = jnp.sum(jnp.where(onehot_c, cdf, 0.0), axis=0, keepdims=True)
        muk_sel = jnp.sum(jnp.where(onehot_c, muk, 0.0), axis=0,
                          keepdims=True)
        sqb_sel = jnp.sum(jnp.where(onehot_c, sqb, 0.0), axis=0,
                          keepdims=True)
        beta_sampled = jnp.where(comp == 0, 0.0, muk_sel + sqb_sel * z_j)

        beta_new = jnp.where(live_j, beta_sampled,
                             jnp.where(zerob_j, 0.0, beta_old_j))
        comp_new = jnp.where(live_j, comp.astype(jnp.float32), comp_old_j)
        acum_new = jnp.where(live_j, acum, jnp.where(zerob_j, 1.0,
                                                     acum_old_j))
        dbeta_j = jnp.where(live_j, beta_old_j - beta_sampled, 0.0)

        out_ref[j] = jnp.concatenate(
            [dbeta_j, beta_new, comp_new, acum_new], axis=0)

        @pl.when(jnp.any(dbeta_j != 0.0))
        def _():
            corr_ref[:, :] = corr_ref[:, :] + gs_ref[j] * dbeta_j

        return 0

    jax.lax.fori_loop(0, B, step, 0)


@functools.lru_cache(maxsize=64)
def _build_call(T, B, K, interpret):
    kern = functools.partial(_scan_kernel, n_mix=K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((B, T), jnp.float32)],
    )
    out_shape = [jax.ShapeDtypeStruct((B, 4, T), jnp.float32)]
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )


def block_scan_pallas(
    c, gs, beta_old, comp_old, acum_old, grp, valid, u, z,
    sigmag, sigmae, pi_est, cva, cvai, nonas, n_total,
    axis_name=None, interpret=False,
) -> BlockScanResult:
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
    denom = (n_total_f - 1.0) + sige_g[:, :, None] * cvai_b[None]
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
    live = (validb & (~adav)).astype(f32)                  # (T, B)
    zerob = (validb & adav).astype(f32)

    in_pack = jnp.stack([
        base, u.astype(f32), z.astype(f32), beta_old_f,
        comp_old.astype(f32), acum_old.astype(f32), live, zerob,
    ], axis=0)                                             # (8, T, B)
    in_pack = jnp.transpose(in_pack, (2, 0, 1))            # (B, 8, T)
    kp_pack = jnp.concatenate([lc, rd, sqb], axis=2)       # (T, B, 3K)
    kp_pack = jnp.transpose(kp_pack, (1, 2, 0))            # (B, 3K, T)
    gs_bbt = jnp.transpose(gs, (1, 2, 0)).astype(f32)      # (B, B, T)

    call = _build_call(T, B, K, interpret)
    (out_pack,) = call(
        in_pack, kp_pack, gs_bbt,
        (1.0 / (2.0 * sigmae_f)).reshape(1, T),
    )
    dbeta = out_pack[:, 0, :].T                            # (T, B)
    beta_new = out_pack[:, 1, :].T
    comp_new = out_pack[:, 2, :].T.astype(jnp.int32)
    acum_new = out_pack[:, 3, :].T

    live_i = live.astype(jnp.int32)
    onehot_k = jax.nn.one_hot(comp_new, K, dtype=jnp.int32)     # (T, B, K)
    onehot_g = jax.nn.one_hot(grp, G, dtype=jnp.int32)          # (B, G)
    cass_inc = jnp.einsum(
        "tbk,bg->tgk", onehot_k * live_i[:, :, None], onehot_g)

    return BlockScanResult(
        dbeta_eff=dbeta.astype(c.dtype),
        beta_new=beta_new.astype(c.dtype),
        comp_new=comp_new,
        acum_new=acum_new.astype(c.dtype),
        cass_inc=cass_inc,
    )
