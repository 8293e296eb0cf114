"""The within-block serial Gibbs scan.

Given the block's precomputed dot products ``c`` and scaled Gram matrix
``gs`` (see gmrm_tpu.ops.blockops), this reproduces the reference's exact
per-marker recursion (``src/bayes.cpp:391-492``) — mixture likelihoods,
the sequential CDF walk with |dlogl| > 700 overflow guards, component
selection, and effect draw — for B markers and T traits, with the residual
interaction reduced to ``num_j = c_j + sum_{i<j} gs[j,i] * dbeta_i``.

All randomness is injected (u uniforms, z standard normals per marker slot
and trait), so this function is a pure deterministic map and can be checked
against the NumPy serial oracle bit-for-bit up to float tolerance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BlockScanResult(NamedTuple):
    dbeta_eff: jnp.ndarray   # (T, B) standardized-scale beta_old - beta_new,
                             # zeroed where the reference does not share the
                             # update (adaV zeroing / padding)
    beta_new: jnp.ndarray    # (T, B)
    comp_new: jnp.ndarray    # (T, B) int32
    acum_new: jnp.ndarray    # (T, B)
    cass_inc: jnp.ndarray    # (T, G, K) int32


def block_scan(
    c,            # (T, B) msig-scaled x^T eps at block start
    gs,           # (T, B, B) scaled Gram: msig_j*msig_i*graw
    beta_old,     # (T, B)
    comp_old,     # (T, B) int32
    acum_old,     # (T, B)
    grp,          # (B,) int32 group ids
    valid,        # (B,) bool: real (non-pad) marker
    u,            # (T, B) uniforms
    z,            # (T, B) std normals
    sigmag,       # (T, G)
    sigmae,       # (T,)
    pi_est,       # (T, G, K)
    cva,          # (G, K)
    cvai,         # (G, K)
    nonas,        # (T,)
    n_total,      # () float
    axis_name=None,  # mesh axis when running under shard_map (vma tracking)
) -> BlockScanResult:
    T, B = c.shape
    G, K = cva.shape
    dtype = c.dtype
    t_idx = jnp.arange(T)

    inv2sige = 1.0 / (2.0 * sigmae)                     # (T,)

    def step(carry, xs):
        dbeta_vec, cass_inc = carry
        (c_j, g_row, beta_old_j, comp_old_j, acum_old_j,
         grp_j, valid_j, u_j, z_j) = xs

        sg = sigmag[:, grp_j]                           # (T,)
        adav = sg == 0.0
        sg_safe = jnp.where(adav, jnp.asarray(1.0, dtype), sg)
        sige_g = sigmae / sg_safe
        sigg_e = sg_safe / sigmae

        # num = x_j^T eps_current + beta_old*(nonas-1)   (bayes.cpp:418-421)
        num = (
            c_j
            + jnp.einsum("tb,tb->t", g_row, dbeta_vec)
            + beta_old_j * (nonas - 1.0)
        )

        denom = (n_total - 1.0) + sige_g[:, None] * cvai[grp_j, 1:]  # (T, K-1)
        muk = jnp.concatenate(
            [jnp.zeros((T, 1), dtype), num[:, None] / denom], axis=1
        )                                                # (T, K)

        logl = jnp.log(pi_est[:, grp_j, :])              # (T, K)
        tail = (
            -0.5 * jnp.log(sigg_e[:, None] * (nonas[:, None] - 1.0)
                           * cva[grp_j, 1:] + 1.0)
            + muk[:, 1:] * num[:, None] * inv2sige[:, None]
        )
        logl = logl.at[:, 1:].add(tail)

        # Sequential CDF walk with overflow guards (bayes.cpp:435-477).
        over0 = jnp.any(jnp.abs(logl - logl[:, :1]) > 700.0, axis=1)
        acum = jnp.where(
            over0,
            jnp.asarray(0.0, dtype),
            1.0 / jnp.sum(jnp.exp(logl - logl[:, :1]), axis=1),
        )
        comp = jnp.full((T,), K - 1, jnp.int32)
        chosen = jnp.zeros((T,), bool)
        for i in range(K):
            sel = (~chosen) & ((u_j <= acum) | (i == K - 1))
            comp = jnp.where(sel, i, comp)
            chosen = chosen | sel
            if i < K - 1:
                ref = logl[:, i + 1]
                zero_inc = jnp.any(
                    jnp.abs(logl[:, i + 1:] - ref[:, None]) > 700.0, axis=1
                )
                esum = jnp.sum(jnp.exp(logl - ref[:, None]), axis=1)
                inc = jnp.where(zero_inc, jnp.asarray(0.0, dtype), 1.0 / esum)
                acum = jnp.where(chosen, acum, acum + inc)

        # Effect draw for the selected slab (bayes.cpp:450-459).
        denom_sel = denom[t_idx, jnp.clip(comp - 1, 0, K - 2)]
        beta_drawn = muk[t_idx, comp] + jnp.sqrt(sigmae / denom_sel) * z_j
        beta_sampled = jnp.where(comp == 0, jnp.asarray(0.0, dtype), beta_drawn)

        # adaV short-circuit (bayes.cpp:396-400): beta zeroed, acum = 1,
        # comp/cass untouched, no residual update shared.
        live = valid_j & (~adav)                         # (T,)
        beta_new = jnp.where(
            valid_j,
            jnp.where(adav, jnp.asarray(0.0, dtype), beta_sampled),
            beta_old_j,
        )
        comp_new = jnp.where(live, comp, comp_old_j)
        acum_new = jnp.where(
            valid_j,
            jnp.where(adav, jnp.asarray(1.0, dtype), acum),
            acum_old_j,
        )

        onehot = jax.nn.one_hot(comp, K, dtype=jnp.int32)      # (T, K)
        cass_inc = cass_inc.at[:, grp_j, :].add(
            onehot * live[:, None].astype(jnp.int32)
        )

        dbeta_j = jnp.where(live, beta_old_j - beta_sampled,
                            jnp.asarray(0.0, dtype))
        return (dbeta_vec, cass_inc), (beta_new, comp_new, acum_new, dbeta_j)

    # The step index is threaded through xs so dbeta_j lands in the carry
    # slot that later markers' Gram corrections read.
    def step_indexed(carry, xs):
        j = xs[0]
        (dbeta_vec, cass_inc), (beta_new, comp_new, acum_new, dbeta_j) = step(
            carry, xs[1:]
        )
        dbeta_vec = dbeta_vec.at[:, j].set(dbeta_j)
        return (dbeta_vec, cass_inc), (beta_new, comp_new, acum_new)

    xs = (
        jnp.arange(B),
        jnp.moveaxis(c, 1, 0),             # (B, T)
        jnp.moveaxis(gs, 1, 0),            # (B, T, B)
        jnp.moveaxis(beta_old, 1, 0),
        jnp.moveaxis(comp_old, 1, 0),
        jnp.moveaxis(acum_old, 1, 0),
        grp,
        valid,
        jnp.moveaxis(u, 1, 0),
        jnp.moveaxis(z, 1, 0),
    )
    init = (
        jnp.zeros((T, B), dtype),
        jnp.zeros((T,) + cva.shape, jnp.int32),
    )
    if axis_name is not None:
        # Under shard_map the carries become device-varying (they absorb
        # per-shard draws); mark the fresh zeros accordingly.
        init = jax.tree.map(lambda x: jax.lax.pcast(x, (axis_name,), to='varying'), init)
    (dbeta_vec, cass_inc), (beta_new, comp_new, acum_new) = jax.lax.scan(
        step_indexed, init, xs
    )
    return BlockScanResult(
        dbeta_eff=dbeta_vec,
        beta_new=jnp.moveaxis(beta_new, 0, 1),
        comp_new=jnp.moveaxis(comp_new, 0, 1),
        acum_new=jnp.moveaxis(acum_new, 0, 1),
        cass_inc=cass_inc,
    )
