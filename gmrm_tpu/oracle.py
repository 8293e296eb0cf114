"""NumPy port-of-record of the reference sampler math (float64, serial).

This is the correctness anchor: a direct, unoptimized transcription of the
marker sweep of ``/root/reference/src/bayes.cpp:375-553`` (dot product at
``bayes.cpp:709-770``, rank-1 residual update at ``src/phenotype.cpp:326-393``,
mixture-component walk incl. the |dlogl| > 700 overflow guards at
``bayes.cpp:413-477``) and the hyperparameter block (``bayes.cpp:562-651``).

All randomness is *injected* (pre-drawn arrays), so the TPU blocked-Gram
sweep can be compared against this serial recursion bit-for-bit up to float
tolerance.  Used by tests and as the CPU throughput baseline proxy.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gmrm_tpu.config import V0E, S02E, V0G, S02G


def marker_stats(a: np.ndarray, b: np.ndarray, na: np.ndarray, nonas: int):
    """Per-marker mean/inverse-sd over observed entries.

    Reference compute_markers_statistics (src/phenotype.cpp:466-556):
    mave = sum(a*na)/sum(b*na); msig = 1/sqrt(sum(((a-mave)*b*na)^2)/(nonas-1)).
    a, b: (M, Np) decoded planes; na: (Np,) 0/1 phenotype mask.
    """
    suma = (a * na).sum(axis=1)
    sumb = (b * na).sum(axis=1)
    mave = suma / sumb
    xc = (a - mave[:, None]) * b * na
    msig = 1.0 / np.sqrt((xc ** 2).sum(axis=1) / (nonas - 1.0))
    return mave, msig


@dataclass
class OracleState:
    """Mutable per-trait sampler state (the reference Phenotype's fields)."""
    eps: np.ndarray            # (Np,) residual, 0 at NAs
    betas: np.ndarray          # (M,)
    comp: np.ndarray           # (M,) int
    acum: np.ndarray           # (M,)
    cass: np.ndarray           # (G, K) int
    sigmag: np.ndarray         # (G,)
    sigmae: float
    pi_est: np.ndarray         # (G, K)
    mu: float
    nonas: int
    epssum: float = 0.0        # reference quirk: never updated (phenotype.hpp:52)


def sweep_serial(
    state: OracleState,
    a: np.ndarray,             # (M, Np) dosage plane
    b: np.ndarray,             # (M, Np) present plane
    na: np.ndarray,            # (Np,) phenotype mask
    mave: np.ndarray,
    msig: np.ndarray,
    group_of: np.ndarray,      # (M,) group id per local marker
    cva: np.ndarray,           # (G, K)
    cvai: np.ndarray,          # (G, K)
    perm: np.ndarray,          # (M,) processing order (shuffled local indices)
    u: np.ndarray,             # (M,) uniforms, indexed by processing slot
    z: np.ndarray,             # (M,) std normals, indexed by processing slot
    n_total: int,              # N (the reference's dims N, not nonas)
) -> None:
    """One full marker sweep, updating state in place.

    Mirrors the per-marker loop bayes.cpp:375-553 for a single rank (the
    multi-rank replay protocol collapses to in-place updates).
    """
    G, K = state.pi_est.shape
    eps = state.eps
    for slot in range(perm.shape[0]):
        j = int(perm[slot])
        g = int(group_of[j])

        # adaV: group variance pinned to zero -> zero the marker silently
        # (bayes.cpp:396-400; note epsilon is NOT updated and cass/comp are
        # NOT touched).
        if state.sigmag[g] == 0.0:
            state.acum[j] = 1.0
            state.betas[j] = 0.0
            continue

        beta_old = state.betas[j]
        sige_g = state.sigmae / state.sigmag[g]
        sigg_e = 1.0 / sige_g
        inv2sige = 1.0 / (2.0 * state.sigmae)

        denom = (n_total - 1.0) + sige_g * cvai[g, 1:K]        # (K-1,)

        # num = x_j^T eps; x_j = msig*(a - mave*b), eps already 0 at NAs
        # (bayes.cpp:709-770).
        num = msig[j] * (a[j] @ eps - mave[j] * (b[j] @ eps))
        num += beta_old * (state.nonas - 1.0)

        muk = np.zeros(K)
        muk[1:] = num / denom

        logl = np.log(state.pi_est[g]).copy()
        logl[1:] += (
            -0.5 * np.log(sigg_e * (state.nonas - 1.0) * cva[g, 1:K] + 1.0)
            + muk[1:] * num * inv2sige
        )

        p = u[slot]

        if np.any(np.abs(logl - logl[0]) > 700.0):
            acum = 0.0
        else:
            acum = 1.0 / np.exp(logl - logl[0]).sum()
        state.acum[j] = acum

        for i in range(K):
            if p <= state.acum[j] or i == K - 1:
                if i == 0:
                    state.betas[j] = 0.0
                else:
                    sd = np.sqrt(state.sigmae / denom[i - 1])
                    state.betas[j] = muk[i] + sd * z[slot]
                state.cass[g, i] += 1
                state.comp[j] = i
                break
            else:
                zero_inc = np.any(np.abs(logl[i + 1:] - logl[i + 1]) > 700.0)
                if not zero_inc:
                    esum = np.exp(logl - logl[i + 1]).sum()
                    state.acum[j] += 1.0 / esum

        dbeta = beta_old - state.betas[j]
        if dbeta != 0.0:
            # eps += dbeta * msig * (a - mave*b) * na  (phenotype.cpp:326-393)
            eps += dbeta * msig[j] * (a[j] - mave[j] * b[j]) * na


def sweep_replay_sharded(
    state: OracleState,
    a: np.ndarray,             # (M, Np) dosage plane (global)
    b: np.ndarray,             # (M, Np) present plane
    na: np.ndarray,            # (Np,) phenotype mask
    mave: np.ndarray,          # (M,)
    msig: np.ndarray,          # (M,)
    group_of: np.ndarray,      # (M,) global
    cva: np.ndarray,
    cvai: np.ndarray,
    shard_blocks,              # [(start, len)] global marker block per shard
    perms,                     # per shard: (m_pad_shard,) local slot order
    us, zs,                    # per shard: (m_pad_shard,) slot-indexed draws
    block_size: int,
    n_total: int,
) -> None:
    """D-rank replay of the blocked sharded sweep, updating state in place.

    The TPU sharded sampler's protocol (gmrm_tpu.parallel.runner /
    sampler.gibbs): at each block step every shard runs its next
    ``block_size`` markers SERIALLY against the residual as of the block
    start (its own within-block moves visible through a local copy), then
    all shards' residual deltas merge — the psum that replaces the
    reference's per-marker MPI_Allgatherv replay (bayes.cpp:500-553).
    block_size = 1 reproduces the reference's per-marker cadence exactly.

    Slots >= the shard's real marker count are idle pads (the reference's
    Mm idle steps, bayes.cpp:375-382).
    """
    G, K = state.pi_est.shape
    m_pad_shard = perms[0].shape[0]
    assert m_pad_shard % block_size == 0
    nblocks = m_pad_shard // block_size

    for k in range(nblocks):
        deps_total = np.zeros_like(state.eps)
        for d, (start, ln) in enumerate(shard_blocks):
            eps_d = state.eps.copy()
            for slot in range(k * block_size, (k + 1) * block_size):
                jl = int(perms[d][slot])
                if jl >= ln:
                    continue                      # pad slot: idle step
                j = start + jl
                g = int(group_of[j])
                if state.sigmag[g] == 0.0:
                    state.acum[j] = 1.0
                    state.betas[j] = 0.0
                    continue
                beta_old = state.betas[j]
                sige_g = state.sigmae / state.sigmag[g]
                sigg_e = 1.0 / sige_g
                inv2sige = 1.0 / (2.0 * state.sigmae)
                denom = (n_total - 1.0) + sige_g * cvai[g, 1:K]
                num = msig[j] * (a[j] @ eps_d - mave[j] * (b[j] @ eps_d))
                num += beta_old * (state.nonas - 1.0)
                muk = np.zeros(K)
                muk[1:] = num / denom
                logl = np.log(state.pi_est[g]).copy()
                logl[1:] += (
                    -0.5 * np.log(sigg_e * (state.nonas - 1.0)
                                  * cva[g, 1:K] + 1.0)
                    + muk[1:] * num * inv2sige
                )
                p = us[d][slot]
                if np.any(np.abs(logl - logl[0]) > 700.0):
                    acum = 0.0
                else:
                    acum = 1.0 / np.exp(logl - logl[0]).sum()
                state.acum[j] = acum
                for i in range(K):
                    if p <= state.acum[j] or i == K - 1:
                        if i == 0:
                            state.betas[j] = 0.0
                        else:
                            sd = np.sqrt(state.sigmae / denom[i - 1])
                            state.betas[j] = muk[i] + sd * zs[d][slot]
                        state.cass[g, i] += 1
                        state.comp[j] = i
                        break
                    else:
                        zero_inc = np.any(
                            np.abs(logl[i + 1:] - logl[i + 1]) > 700.0)
                        if not zero_inc:
                            esum = np.exp(logl - logl[i + 1]).sum()
                            state.acum[j] += 1.0 / esum
                dbeta = beta_old - state.betas[j]
                if dbeta != 0.0:
                    eps_d += dbeta * msig[j] * (a[j] - mave[j] * b[j]) * na
            deps_total += eps_d - state.eps
        state.eps += deps_total


def hyper_block(
    state: OracleState,
    group_of: np.ndarray,
    mtotgrp: np.ndarray,       # (G,) total markers per group (global)
    n_total: int,
    draw_inv_chisq,            # callable(a, b) -> float
    draw_gamma,                # callable(shape) -> float (scale 1)
) -> None:
    """Post-sweep hyperparameter updates (bayes.cpp:562-651)."""
    G, K = state.pi_est.shape
    beta_sqn = np.zeros(G)
    np.add.at(beta_sqn, group_of, state.betas ** 2)

    for g in range(G):
        if mtotgrp[g] == 0:
            continue
        m0 = mtotgrp[g] - state.cass[g, 0]
        if m0 == 0 or state.cass[g].sum() == 0:
            state.sigmag[g] = 0.0
            continue
        state.sigmag[g] = draw_inv_chisq(
            V0G + m0, (beta_sqn[g] * m0 + V0G * S02G) / (V0G + m0)
        )
        # Dirichlet via normalized gammas (phenotype.cpp:227-237; dirich=1).
        gs = np.array([draw_gamma(state.cass[g, i] + 1.0) for i in range(K)])
        state.pi_est[g] = gs / gs.sum()

    e_sqn = float(state.eps @ state.eps)
    state.sigmae = draw_inv_chisq(
        V0E + n_total, (e_sqn + V0E * S02E) / (V0E + n_total)
    )


def m0_of(state: OracleState, mtotgrp: np.ndarray) -> np.ndarray:
    return mtotgrp - state.cass[:, 0]
