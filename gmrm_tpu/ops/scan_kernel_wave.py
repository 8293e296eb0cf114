"""Wave-mode Pallas kernel for the within-block scan.

Generalizes the serial scan with a *wave width* W: the block's markers are
processed in B/W serial steps of W markers each.  Markers within a wave
draw against the residual state as of the wave start (blind to each
other's same-wave moves); the wave's rank-W Gram correction is folded
before the next wave.

Statistical position: this is EXACTLY the relaxation the reference's own
multi-rank protocol makes — D MPI ranks process D markers simultaneously,
each blind to the others' same-step moves, merging afterwards
(bayes.cpp:375-553).  A width-W wave on one shard is equivalent to W
co-scheduled shards, except strictly closer to the serial sampler (waves
DO see all earlier waves in the same block, which co-scheduled shards do
not).  W=1 reduces to the exact serial recursion (validated against
sampler.scan.block_scan bit-for-bit in tests); W>1 is the throughput mode
and is validated statistically (multi-seed chain moments + the
compiled-reference equivalence harness).

Why it is fast:

- A wave step costs about the same as one serial step (all candidate math
  is (T, W) one-VREG ops with traits on sublanes / markers on lanes, and
  the correction is one tiny MXU dot per trait), so the scan cost drops
  ~W-fold vs the serial kernel.
- The reference's CDF walk (``bayes.cpp:435-477``) evaluates K*K
  pairwise terms 1/sum_k2 exp(logl_k2 - logl_i).  logl is *affine in
  q = num^2/(2 sigmaE)*: logl_k = lc_k + q*rd_k — so the walk collapses
  to sarr_i = E_i / S with E_k = exp(L_k - Lmax), S = sum_k E_k: K
  overflow-free exponentials per wave, K-sized precomputed tables (no
  K^2 pair prep — that prep was HALF the iteration, PROFILE.md), and the
  |dlogl| > 700 guard over pairs k2 >= i becomes a suffix max/min test.

Layout: trait axis T on sublanes, marker axis B on lanes.  Waves are
STATIC lane slices (dynamic lane slicing is illegal on TPU); the scaled
Gram ``gs`` keeps its native (T, B, B) layout and is sliced statically.
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

# Test hook: force interpret-mode execution (CPU test suites).
FORCE_INTERPRET = False


def _wave_kernel(
    base_ref,        # (T, B) f32
    lc_ref,          # (K, T, B) f32: q-independent logl coefficients
    rd_ref,          # (K, T, B) f32
    sqb_ref,         # (K, T, B) f32
    gs_ref,          # (T*B, B) f32 scaled Gram, wave-stacked rows:
                     #   row w*(T*W) + t*W + j  =  gs[t, w*W + j, :]
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
    *, n_mix: int, n_traits: int, wave: int,
):
    T, B = base_ref.shape
    K = n_mix
    W = wave
    assert B % W == 0
    nwaves = B // W

    i2se = i2se_ref[:, :]                                    # (T, 1)
    corr_ref[:, :] = jnp.zeros((T, B), jnp.float32)

    # Block-diagonal selector for the one-dot correction fold:
    # diag_mask[t, r*W + j] = (r == t).
    TW = T * W
    diag_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (T, TW), 1) // W
        == jax.lax.broadcasted_iota(jnp.int32, (T, TW), 0)
    )

    for w in range(nwaves):
        s = slice(w * W, (w + 1) * W)
        live = live_ref[:, s] != 0                           # (T, W)
        zerob = zerob_ref[:, s] != 0
        beta_old = beta_old_ref[:, s]

        num = base_ref[:, s] + corr_ref[:, s]                # (T, W)
        q = num * num * i2se                                 # (T, W)

        # logl is affine in q per component: L_k = lc_k + q*rd_k
        # (bayes.cpp:425-433).  The reference's per-pair CDF terms
        # 1/sum_k2 exp(L_k2 - L_i) collapse to E_i/S with
        # E_k = exp(L_k - Lmax), S = sum E_k — K exps instead of K^2
        # pair tables, no overflow (E_k <= 1).  The |dlogl| > 700 guard
        # over pairs k2 >= i (bayes.cpp:435-477) becomes a suffix
        # max/min test.
        L = [lc_ref[k][:, s] + q * rd_ref[k][:, s] for k in range(K)]
        lmax = L[0]
        for k in range(1, K):
            lmax = jnp.maximum(lmax, L[k])
        e = [jnp.exp(L[k] - lmax) for k in range(K)]
        ssum = e[0]
        for k in range(1, K):
            ssum = ssum + e[k]
        sufmax = [None] * K
        sufmin = [None] * K
        sufmax[K - 1] = L[K - 1]
        sufmin[K - 1] = L[K - 1]
        for i in range(K - 2, -1, -1):
            sufmax[i] = jnp.maximum(L[i], sufmax[i + 1])
            sufmin[i] = jnp.minimum(L[i], sufmin[i + 1])
        inv_s = 1.0 / ssum
        cdf = []                                             # running sum
        prev = None
        for i in range(K):
            over = ((sufmax[i] - L[i] > 700.0)
                    | (L[i] - sufmin[i] > 700.0))
            si = jnp.where(over, 0.0, e[i] * inv_s)          # (T, W)
            prev = si if prev is None else prev + si
            cdf.append(prev)

        u = u_ref[:, s]
        comp = jnp.full((T, W), K - 1, jnp.int32)
        for i in range(K - 1, -1, -1):
            comp = jnp.where(u <= cdf[i], i, comp)
        acum_sel = cdf[K - 1]
        muk_sel = num * rd_ref[K - 1][:, s]
        sqb_sel = sqb_ref[K - 1][:, s]
        for i in range(K - 2, -1, -1):
            is_i = comp == i
            acum_sel = jnp.where(is_i, cdf[i], acum_sel)
            muk_sel = jnp.where(is_i, num * rd_ref[i][:, s], muk_sel)
            sqb_sel = jnp.where(is_i, sqb_ref[i][:, s], sqb_sel)

        beta_samp = jnp.where(comp == 0, 0.0,
                              muk_sel + sqb_sel * z_ref[:, s])
        dbeta = jnp.where(live, beta_old - beta_samp, 0.0)   # (T, W)

        dbeta_ref[:, s] = dbeta
        beta_new_ref[:, s] = jnp.where(
            live, beta_samp, jnp.where(zerob, 0.0, beta_old))
        comp_new_ref[:, s] = jnp.where(live, comp, comp_old_ref[:, s])
        acum_new_ref[:, s] = jnp.where(
            live, acum_sel, jnp.where(zerob, 1.0, acum_old_ref[:, s]))

        # Fold the wave's rank-W correction for ALL traits in ONE MXU dot:
        # corr += M @ G with M (T, T*W) block-diagonal in dbeta and
        # G (T*W, B) the wave's stacked per-trait Gram rows.  (T serial
        # per-trait dots were the wave step's latency bottleneck.)
        # Skipped entirely when the wave produced no moves.
        @pl.when(jnp.any(dbeta != 0.0))
        def _():
            G = gs_ref[w * TW:(w + 1) * TW, :]               # (T*W, B)
            m_blk = jnp.where(
                diag_mask, pltpu.repeat(dbeta, T, axis=1), 0.0)  # (T, T*W)
            corr_ref[...] = corr_ref[...] + jax.lax.dot_general(
                m_blk, G, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


@functools.lru_cache(maxsize=64)
def _build_call(T, B, K, W, interpret, vma=None):
    kern = functools.partial(_wave_kernel, n_mix=K, n_traits=T, wave=W)
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


def make_block_scan_wave(wave: int):
    """Returns a block_scan-compatible function with wave width ``wave``."""

    def block_scan_wave(
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
            sigg_e[:, :, None] * (nonas_f[:, :, None] - 1.0)
            * cva_b[None] + 1.0)
        lc = logpi.at[:, :, 1:].add(tail_c)

        nw = B // wave
        base = c + beta_old_f * (nonas_f - 1.0)                # (T, B)
        validb = valid[None, :]                                # (1, B)
        live = (validb & (~adav)).astype(jnp.int32)            # (T, B)
        zerob = (validb & adav).astype(jnp.int32)

        # Wave-stacked Gram rows: row w*(T*wave) + t*wave + j.
        gs_ws = jnp.transpose(
            gs.astype(f32).reshape(T, nw, wave, B), (1, 0, 2, 3)
        ).reshape(T * B, B)

        call = _build_call(T, B, K, wave,
                           resolve_interpret(interpret or FORCE_INTERPRET),
                           out_vma(axis_name))
        outs = call(*shard_varying(
            axis_name,
            base,
            jnp.transpose(lc, (2, 0, 1)),                      # (K, T, B)
            jnp.transpose(rd, (2, 0, 1)),
            jnp.transpose(sqb, (2, 0, 1)),
            gs_ws,                                             # (T*B, B)
            beta_old_f, comp_old.astype(jnp.int32),
            acum_old.astype(f32), u.astype(f32), z.astype(f32),
            live, zerob,
            (1.0 / (2.0 * sigmae_f)),                          # (T, 1)
        ))
        dbeta, beta_new, comp_new, acum_new = outs

        onehot_k = jax.nn.one_hot(comp_new, K, dtype=jnp.int32)
        onehot_g = jax.nn.one_hot(grp, G, dtype=jnp.int32)
        cass_inc = jnp.einsum(
            "tbk,bg->tgk", onehot_k * live[:, :, None], onehot_g)

        return BlockScanResult(
            dbeta_eff=dbeta.astype(c.dtype),
            beta_new=beta_new.astype(c.dtype),
            comp_new=comp_new,
            acum_new=acum_new.astype(c.dtype),
            cass_inc=cass_inc,
        )

    return block_scan_wave


# W=1 is the exact serial recursion (cross-checked against
# sampler.scan.block_scan in tests/test_scan_kernel.py).
block_scan_pallas = make_block_scan_wave(1)
