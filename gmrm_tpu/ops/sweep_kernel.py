"""Whole-sweep mega-kernel: the full marker sweep in ONE pallas_call.

The production sweep is a serial chain over ``nblocks`` Gram blocks
(gibbs.marker_sweep): per block a Gram kernel, a wave-scan kernel, and a
residual-update kernel, glued by XLA inside a ``lax.scan``.  That costs
three kernel launches per block, an HBM round trip for the (T, B, B)
scaled Gram, and two decodes of the block's packed bytes.

Here the whole sweep is one Pallas program with ``grid=(nblocks,)``.  TPU
grid steps execute sequentially on the core — exactly the sweep's data
dependence — while the next block's packed bed tile is DMA'd in parallel
by the pipeline.  The residual ``eps`` lives in a VMEM scratch for the
entire sweep; the Gram never touches HBM; bed bytes are read once per
block (decoded twice in-register: Gram + update).

Per grid step b:
  1. fused decode + Gram over lane tiles (as ops/pallas_kernels.py),
  2. the wave scan (as ops/scan_kernel_wave.py) on the in-VMEM c/gs,
  3. fused decode + rank-W residual update applied to the eps scratch,
  4. per-block outputs (beta/comp/acum/dbeta) written to their slots.

Single-device path only: the multi-device sweep needs a psum of the block
residual delta between blocks (gibbs.marker_sweep keeps that structure).

Shape requirements: ``mb_pad`` (packed bytes per marker) must be a
multiple of the 512-byte lane tile and every plane input padded
accordingly (pad bytes 0x55 decode to zero — io/bed.py MISSING_BYTE), so
the tile loop needs no masking.  VMEM budget: the full (B, mb_pad) bed
block plus four (T, 4, mb_pad) planes must fit (~N <= 64k individuals at
B = 128, T = 4; N = 50k measured on device, benchmarking/SCALE.md);
larger N falls back to the per-block kernels.

Reference mapping: the fused math is the same restructuring of
``src/bayes.cpp:375-553`` documented in ops/blockops.py,
ops/pallas_kernels.py and ops/scan_kernel_wave.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gmrm_tpu.ops.pallas_kernels import (
    _decode_tile, _LANES, resolve_interpret,
)

_BF16 = jnp.bfloat16
_F32 = jnp.float32

# Test hook: force interpret-mode execution (CPU test suites).
FORCE_INTERPRET = False

# Profiling hook (benchmarking/profile_mega.py): phase names to null out,
# any of {"cab", "gramperm", "scan", "update"}.  NOT for production — the
# outputs are wrong when any phase is skipped.
DEBUG_SKIP = frozenset()


# Lane-tile budget for the N-tiled kernels (tests shrink it to exercise
# multi-tile grids on small data).
TILE_MAX_LANES = 8


def pick_lane_tile(mb_pad: int, max_lanes: int = 0) -> int:
    """Largest lane-tile width (bytes, multiple of _LANES, dividing
    ``mb_pad``) not exceeding ``max_lanes * _LANES``.  Used by the
    N-tiled kernels to stream the individuals axis through VMEM in
    uniform grid tiles."""
    assert mb_pad % _LANES == 0
    max_lanes = max_lanes or TILE_MAX_LANES
    lanes = mb_pad // _LANES
    if lanes <= max_lanes:
        return mb_pad
    best = 1
    for n in range(2, lanes + 1):
        if lanes % n == 0 and lanes // n <= max_lanes:
            best = lanes // n
            break
    return best * _LANES


def vmem_fits(n_traits: int, block_size: int, mb_pad: int,
              budget_bytes: int = 14 * 1024 * 1024, nt: int = 1) -> bool:
    """Conservative VMEM feasibility estimate for the mega-kernel.

    ``nt`` is the Gram trait axis (1 under shared_na, n_traits with
    per-trait NA masks): the cache buffers and gfull scratch all scale
    with it (code-review r5 — the NT=1-only model under-estimated by
    (NT-1)*3*(2B)^2*4 bytes and picked unfittable kernels)."""
    bed = 2 * block_size * mb_pad                      # double-buffered u8
    bedp = 2 * block_size * mb_pad                     # permuted bf16 scratch
    gcache = 2 * nt * (2 * block_size) ** 2 * 4        # double-buffered gram
    planes = 4 * n_traits * 4 * mb_pad * 4             # eps0/na/eps_s/out f32
    gram = nt * (2 * block_size) ** 2 * 4 + \
        n_traits * block_size * block_size * 4         # gfull scratch + gs
    transients = 3 * (2 * block_size) * 4 * _LANES * 2   # a/b/ab bf16 tiles
    return (bed + bedp + gcache + planes + gram + transients
            < budget_bytes)


def _split3(x):
    """Exact 3-way bf16 Dekker split of f32: x == b0 + b1 + b2 with each
    b_i bf16 (8+8+8 mantissa bits cover f32's 24)."""
    b0 = x.astype(_BF16)
    r1 = x - b0.astype(_F32)
    b1 = r1.astype(_BF16)
    r2 = r1 - b1.astype(_F32)
    return b0, b1, r2.astype(_BF16)


def _permute_cols_f32(x, pm, forward):
    """EXACT column permute of arbitrary f32 (T, B) on the MXU: one-hot
    bf16 dots copy values exactly, and the 3-digit split makes the f32
    payload exact too (each output element is b0+b1+b2 of one input —
    representable, so the f32 adds round to it exactly).
    forward: y[:, i] = x[:, win[i]] (natural -> processing);
    else the inverse scatter y[:, win[i]] = x[:, i]."""
    dims = ((((1,), (1,)), ((), ())) if forward
            else (((1,), (0,)), ((), ())))
    acc = None
    for d in _split3(x):
        r = jax.lax.dot_general(d, pm, dims, preferred_element_type=_F32)
        acc = r if acc is None else acc + r
    return acc


def _permute_cols_small(x, pm, forward):
    """Column permute for small non-negative integers (< 256: group ids,
    component ids) — a single exact bf16 one-hot dot."""
    dims = ((((1,), (1,)), ((), ())) if forward
            else (((1,), (0,)), ((), ())))
    return jax.lax.dot_general(x.astype(jnp.int32).astype(_BF16), pm, dims,
                               preferred_element_type=_F32)


def _block_scan_phase(
    blk_b, mloc,                 # traced scalars: natural block id, m_local
    perm_mat,                    # (B, B) bf16 one-hot row permute (value)
    gfull_ref,                   # (1, NT, 2B, 2B) f32 cached raw Gram
    mave_ref, msig_ref,          # (1, T, B) f32, NATURAL row order
    beta_old_ref,                # (1, T, B) f32 natural
    comp_old_ref,                # (1, T, B) i32 natural
    acum_old_ref,                # (1, T, B) f32 natural
    grp_ref,                     # (1, 1, B) i32 natural
    u_ref, z_ref,                # (1, T, B) f32, processing order
    sigmag_ref,                  # (T, G) f32
    lc_ref, rd_ref, sqb_ref,     # (K, T, G) f32 GROUP-level scan tables
    i2se_ref, nonas_ref,         # (T, 1) f32
    beta_new_ref, comp_new_ref, acum_new_ref,   # (1, T, B) natural outs
    gfull_s, cab_s, gs_s, corr_s, dbeta_s,
    *, n_mix, n_traits, wave, shared_na, skip,
):
    """Per-block compute shared by the resident and N-tiled mega-kernels.

    Round-4 restructure: all per-marker prep that was previously built in
    XLA every iteration (processing-order permutes of 7 operand streams,
    the (nblocks, K, T, B) lc/rd/sqb tables, live/zerob masks, and the
    output unpermute) now happens HERE from natural-order operands and
    K x T x G group tables — tables depend only on (group,
    hyperparameters), so per-marker values are exact COPIES selected by
    group id, and the permutes are exact one-hot MXU dots
    (_permute_cols_f32).  Everything stays bit-identical to the composed
    path.  Returns (mave_p, msig_p) in processing order for the residual
    update phase.
    """
    T = n_traits
    B = mave_ref.shape[2]
    K = n_mix
    W = wave
    TW = T * W
    nwaves = B // W
    Gn = sigmag_ref.shape[1]

    # ---- processing-order operands (exact in-kernel permutes) -----------
    mave = _permute_cols_f32(mave_ref[0], perm_mat, True)       # (T, B)
    msig = _permute_cols_f32(msig_ref[0], perm_mat, True)
    beta_old = _permute_cols_f32(beta_old_ref[0], perm_mat, True)
    comp_old = _permute_cols_small(comp_old_ref[0], perm_mat,
                                   True).astype(jnp.int32)
    acum_old = _permute_cols_f32(acum_old_ref[0], perm_mat, True)
    grp_f = _permute_cols_small(grp_ref[0], perm_mat, True)     # (1, B) f32

    # processing row i is natural marker blk_b*B + win[i]; win[i] is
    # recoverable from the permute matrix: win = P @ iota.  The one-hot
    # dot carries the index VALUES through bf16 (exact only <= 256), so
    # split iota into two base-256 digits and permute each exactly —
    # the same digit trick as the Gram permute below; exact to B 65536.
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    digits = ([(iota_i, 1.0)] if B <= 256
              else [(iota_i // 256, 256.0), (iota_i % 256, 1.0)])
    win_f = None
    for dig, scale in digits:
        r = jax.lax.dot_general(dig.astype(_BF16), perm_mat,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=_F32)    # (1, B)
        win_f = r * scale if win_f is None else win_f + r * scale
    valid = ((blk_b * B).astype(_F32) + win_f) < mloc.astype(_F32)  # (1, B)

    # ---- group-table selection (exact copies; adav = sigmag == 0) ------
    def select_g(tab2):          # (T, G) -> (T, B) by grp
        acc = jnp.broadcast_to(tab2[:, 0:1], (T, B))
        for g in range(1, Gn):
            acc = jnp.where(grp_f == float(g), tab2[:, g:g + 1], acc)
        return acc

    sg_sel = select_g(sigmag_ref[...])
    adav = sg_sel == 0.0
    live = valid & (~adav)                                      # (T, B)
    zerob = valid & adav
    lc_m = [select_g(lc_ref[k]) for k in range(K)]
    rd_m = [select_g(rd_ref[k]) for k in range(K)]
    sqb_m = [select_g(sqb_ref[k]) for k in range(K)]

    # ---- permute the cached natural-order Gram to processing order ------
    # G_perm = P2 G P2^T with P2 = blockdiag(P, P) one-hot.  MXU f32 dots
    # are NOT exact on device (bf16-multipass rounding — the on-device
    # agreement gate caught this), but one-hot bf16 dots with f32
    # accumulation ARE.  G entries are exact non-negative integers
    # (< 2^24), so decompose into base-256 bf16 digits, permute each
    # digit exactly, and recombine in f32 — bit-identical to having
    # accumulated the Gram from permuted rows.
    NT = gfull_s.shape[0]
    if "gramperm" in skip:
        for t in range(NT):
            gfull_s[t] = gfull_ref[0, t]
    zb = jnp.zeros((B, B), _BF16)
    p2 = jnp.concatenate(
        [jnp.concatenate([perm_mat, zb], axis=1),
         jnp.concatenate([zb, perm_mat], axis=1)], axis=0)      # (2B, 2B)
    for t in ([] if "gramperm" in skip else range(NT)):
        gf = gfull_ref[0, t]
        d2 = jnp.floor(gf * (1.0 / 65536.0))
        r = gf - d2 * 65536.0
        d1 = jnp.floor(r * (1.0 / 256.0))
        d0 = r - d1 * 256.0
        acc = None
        for dk, scale in ((d2, 65536.0), (d1, 256.0), (d0, 1.0)):
            tmp = jax.lax.dot_general(
                p2, dk.astype(_BF16), (((1,), (0,)), ((), ())),
                preferred_element_type=_F32)
            res = jax.lax.dot_general(
                tmp.astype(_BF16), p2, (((1,), (1,)), ((), ())),
                preferred_element_type=_F32)
            acc = res * scale if acc is None else acc + res * scale
        gfull_s[t] = acc

    # ---- finalize c, base and the wave-stacked scaled Gram --------------
    cab = cab_s[...]
    csum = cab[:T] + cab[T:]                              # (T, 2B)
    craw = csum[:, :B] - mave * csum[:, B:]
    c = msig * craw                                       # (T, B)
    base = c + beta_old * (nonas_ref[...] - 1.0)          # (T, B)

    for t in range(T):
        gf = gfull_s[0 if shared_na else t]               # (2B, 2B)
        g1 = gf[:B, :B]
        g2 = gf[B:, :B]
        g2t = gf[:B, B:]
        g3 = gf[B:, B:]
        mr = mave[t:t + 1, :]
        mc = jnp.transpose(mr)
        sr = msig[t:t + 1, :]
        sc = jnp.transpose(sr)
        gst = (sc * sr) * (g1 - mr * g2t - mc * g2 + (mc * mr) * g3)
        if "gslayout" in skip:
            continue
        for w in range(nwaves):
            gs_s[w * TW + t * W:w * TW + (t + 1) * W, :] = \
                gst[w * W:(w + 1) * W, :]

    # ---- wave scan (ops/scan_kernel_wave.py math) -----------------------
    i2se = i2se_ref[...]                                  # (T, 1)
    corr_s[...] = jnp.zeros((T, B), _F32)
    diag_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (T, TW), 1) // W
        == jax.lax.broadcasted_iota(jnp.int32, (T, TW), 0)
    )

    if "scan" in skip:
        dbeta_s[...] = jnp.zeros(dbeta_s.shape, _F32)
        beta_new_ref[0] = beta_old_ref[0]
        comp_new_ref[0] = comp_old_ref[0]
        acum_new_ref[0] = acum_old_ref[0]
        return mave, msig

    parts_beta, parts_comp, parts_acum = [], [], []
    for w in range(nwaves):
        s = slice(w * W, (w + 1) * W)
        live_w = live[:, s]
        zerob_w = zerob[:, s]
        beta_old_w = beta_old[:, s]

        num = base[:, s] + corr_s[:, s]
        q = num * num * i2se
        # E/S formulation (see ops/scan_kernel_wave.py): L_k = lc_k +
        # q*rd_k; sarr_i = E_i/S with E_k = exp(L_k - Lmax); the 700
        # pair guard becomes a suffix max/min test.
        L = [lc_m[k][:, s] + q * rd_m[k][:, s] for k in range(K)]
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
        cdf = []
        prev = None
        for i in range(K):
            over = ((sufmax[i] - L[i] > 700.0)
                    | (L[i] - sufmin[i] > 700.0))
            si = jnp.where(over, 0.0, e[i] * inv_s)
            prev = si if prev is None else prev + si
            cdf.append(prev)

        u = u_ref[0][:, s]
        comp = jnp.full((T, W), K - 1, jnp.int32)
        for i in range(K - 1, -1, -1):
            comp = jnp.where(u <= cdf[i], i, comp)
        acum_sel = cdf[K - 1]
        muk_sel = num * rd_m[K - 1][:, s]
        sqb_sel = sqb_m[K - 1][:, s]
        for i in range(K - 2, -1, -1):
            is_i = comp == i
            acum_sel = jnp.where(is_i, cdf[i], acum_sel)
            muk_sel = jnp.where(is_i, num * rd_m[i][:, s], muk_sel)
            sqb_sel = jnp.where(is_i, sqb_m[i][:, s], sqb_sel)

        beta_samp = jnp.where(comp == 0, 0.0,
                              muk_sel + sqb_sel * z_ref[0][:, s])
        dbeta = jnp.where(live_w, beta_old_w - beta_samp, 0.0)

        dbeta_s[:, s] = dbeta
        parts_beta.append(jnp.where(
            live_w, beta_samp, jnp.where(zerob_w, 0.0, beta_old_w)))
        parts_comp.append(jnp.where(live_w, comp, comp_old[:, s]))
        parts_acum.append(jnp.where(
            live_w, acum_sel, jnp.where(zerob_w, 1.0, acum_old[:, s])))

        @pl.when(jnp.any(dbeta != 0.0))
        def _():
            G = gs_s[w * TW:(w + 1) * TW, :]              # (T*W, B)
            m_blk = jnp.where(
                diag_mask, pltpu.repeat(dbeta, T, axis=1), 0.0)
            corr_s[...] = corr_s[...] + jax.lax.dot_general(
                m_blk, G, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32)

    # ---- outputs back to NATURAL order (exact inverse permute) ----------
    beta_new_p = jnp.concatenate(parts_beta, axis=1)      # (T, B) proc
    comp_new_p = jnp.concatenate(parts_comp, axis=1)
    acum_new_p = jnp.concatenate(parts_acum, axis=1)
    beta_new_ref[0] = _permute_cols_f32(beta_new_p, perm_mat, False)
    comp_new_ref[0] = _permute_cols_small(
        comp_new_p, perm_mat, False).astype(jnp.int32)
    acum_new_ref[0] = _permute_cols_f32(acum_new_p, perm_mat, False)
    return mave, msig


def _sweep_kernel(
    blkidx_ref,      # (nblocks,) i32 scalar-prefetch: processing step b
                     # reads natural bed block blkidx[b] (index maps only)
    mloc_ref,        # (1,) i32 scalar-prefetch: real local marker count
    # inputs (per grid step b unless noted)
    bed_ref,         # (B, mb_pad) u8 — natural block blkidx[b]
    win_ref,         # (1, 1, B) i32: within-block shuffle, processing
                     # row i is natural row win[i] of this block
    gfull_ref,       # (1, NT, 2B, 2B) f32: precomputed raw Gram quadrants
                     # of natural block blkidx[b] (build_gram_cache)
    eps0_ref,        # (T, 4, mb_pad) f32   [grid-constant]
    na_ref,          # (NT, 4, mb_pad) f32  [grid-constant; NT=1 if shared]
    mave_ref,        # (1, T, B) f32 — NATURAL block blkidx[b]
    msig_ref,        # (1, T, B) f32 natural
    beta_old_ref,    # (1, T, B) f32 natural
    comp_old_ref,    # (1, T, B) i32 natural
    acum_old_ref,    # (1, T, B) f32 natural
    grp_ref,         # (1, 1, B) i32 natural group ids
    u_ref, z_ref,    # (1, T, B) f32, processing order
    sigmag_ref,      # (T, G) f32
    lc_ref,          # (K, T, G) f32 group-level scan tables
    rd_ref,          # (K, T, G) f32
    sqb_ref,         # (K, T, G) f32
    i2se_ref,        # (T, 1) f32           [grid-constant]
    nonas_ref,       # (T, 1) f32           [grid-constant]
    # outputs
    eps_out_ref,     # (T, 4, mb_pad) f32   [written at last step]
    beta_new_ref,    # (1, T, B) f32 — NATURAL block blkidx[b]
    comp_new_ref,    # (1, T, B) i32 natural
    acum_new_ref,    # (1, T, B) f32 natural
    # scratch
    bedp_s,          # (B, mb_pad) bf16: within-block-permuted packed bytes
    eps_s,           # (T, 4, mb_pad) f32
    gfull_s,         # (NT, 2B, 2B) f32
    cab_s,           # (2T, 2B) f32
    gs_s,            # (T*B, B) f32 wave-stacked
    corr_s,          # (T, B) f32
    dbeta_s,         # (T, B) f32
    *, n_mix: int, n_traits: int, wave: int, shared_na: bool,
    skip=frozenset(),
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    T = n_traits
    B = bed_ref.shape[0]
    mb_pad = bed_ref.shape[1]
    K = n_mix
    W = wave
    TN = _LANES
    ntiles = mb_pad // TN

    @pl.when(b == 0)
    def _():
        eps_s[...] = eps0_ref[...]

    # ---- phase 0: within-block row shuffle of the packed bed ------------
    # One exact MXU pass: P[i, j] = (win[i] == j); u8 values <= 255 are
    # exact in bf16, one nonzero per row, f32 accumulate -> exact bytes.
    # This replaces the former whole-bed HBM permute (1.73 ms/iter at the
    # bench anchor, PROFILE.md): the bed stays in natural order in HBM,
    # block order comes from the scalar-prefetched index map, row order
    # from this in-VMEM permute.
    perm_mat = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                == jnp.transpose(win_ref[0])).astype(_BF16)
    if "bedp" in skip:
        bedp_s[...] = bed_ref[...].astype(jnp.int32).astype(_BF16)
    else:
        bedp_s[...] = jax.lax.dot_general(
            perm_mat,
            bed_ref[...].astype(jnp.int32).astype(_BF16),  # u8->bf16 (i32
            (((1,), (0,)), ((), ())),                      # Mosaic cast)
            preferred_element_type=_F32).astype(_BF16)

    # ---- phase 1: fused decode + x^T.eps over lane tiles ----------------
    # The Gram itself is NOT recomputed: block membership is fixed under
    # the block-preserving shuffle and X never changes, so the raw Gram
    # quadrants come from the precomputed cache (gfull_ref) and only the
    # residual dot products stream over the bed here.
    cab_s[...] = jnp.zeros(cab_s.shape, _F32)

    def cab_tile(i, _):
        off = pl.multiple_of(i * TN, TN)
        bed_t = bedp_s[:, pl.ds(off, TN)]                # (B, TN) bf16
        full = jnp.ones((1, TN), bool)
        a, b2 = _decode_tile(bed_t, full)                 # (B, 4TN) bf16
        ab = jnp.concatenate([a, b2], axis=0)             # (2B, 4TN)

        eps_t = jnp.concatenate(
            [eps_s[:, k, pl.ds(off, TN)] for k in range(4)], axis=1)
        hi = eps_t.astype(_BF16)
        lo = (eps_t - hi.astype(_F32)).astype(_BF16)
        rhs = jnp.concatenate([hi, lo], axis=0)           # (2T, 4TN)
        cab_s[...] += jax.lax.dot_general(
            rhs, ab, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32)
        return 0

    if "cab" not in skip:
        jax.lax.fori_loop(0, ntiles, cab_tile, 0)

    # ---- phase 2: prep + Gram permute + finalize + wave scan (shared) ---
    mave_p, msig_p = _block_scan_phase(
        blkidx_ref[b], mloc_ref[0], perm_mat,
        gfull_ref, mave_ref, msig_ref,
        beta_old_ref, comp_old_ref, acum_old_ref, grp_ref, u_ref, z_ref,
        sigmag_ref, lc_ref, rd_ref, sqb_ref, i2se_ref, nonas_ref,
        beta_new_ref, comp_new_ref, acum_new_ref,
        gfull_s, cab_s, gs_s, corr_s, dbeta_s,
        n_mix=K, n_traits=T, wave=W, shared_na=shared_na, skip=skip)

    # ---- phase 3: fused decode + residual update ------------------------
    dscaled = msig_p * dbeta_s[...]                       # (T, B)
    lhs = jnp.concatenate([dscaled, -(mave_p * dscaled)], axis=1)  # (T, 2B)
    hi = lhs.astype(_BF16)
    lo = (lhs - hi.astype(_F32)).astype(_BF16)
    lhs2 = jnp.concatenate([hi, lo], axis=0)              # (2T, 2B)

    def upd_tile(i, _):
        off = pl.multiple_of(i * TN, TN)
        bed_t = bedp_s[:, pl.ds(off, TN)]
        full = jnp.ones((1, TN), bool)
        a, b2 = _decode_tile(bed_t, full)
        ab = jnp.concatenate([a, b2], axis=0)             # (2B, 4TN)
        out = jax.lax.dot_general(
            lhs2, ab, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32)                  # (2T, 4TN)
        deps = out[:T] + out[T:]
        for k in range(4):
            if shared_na:
                na_k = na_ref[0, k:k + 1, pl.ds(off, TN)]    # (1, TN)
            else:
                na_k = na_ref[:, k, pl.ds(off, TN)]          # (T, TN)
            eps_s[:, k, pl.ds(off, TN)] += \
                deps[:, k * TN:(k + 1) * TN] * na_k
        return 0

    if "update" not in skip:
        jax.lax.fori_loop(0, ntiles, upd_tile, 0)

    @pl.when(b == nb - 1)
    def _():
        eps_out_ref[...] = eps_s[...]


@functools.lru_cache(maxsize=None)
def _build_sweep_call(nblocks, B, mb_pad, T, K, W, G, shared_na, interpret,
                      skip=frozenset()):
    NT = 1 if shared_na else T
    kern = functools.partial(_sweep_kernel, n_mix=K, n_traits=T, wave=W,
                             shared_na=shared_na, skip=skip)
    in_specs = [
        # bed stays in natural order in HBM; processing step b DMAs
        # natural block blkidx[b] (the scalar-prefetched block order).
        pl.BlockSpec((B, mb_pad), lambda b, blk, ml: (blk[b], 0)),  # bed
        pl.BlockSpec((1, 1, B), lambda b, blk, ml: (b, 0, 0)),      # win
        pl.BlockSpec((1, NT, 2 * B, 2 * B),
                     lambda b, blk, ml: (blk[b], 0, 0, 0)),         # gfull
        pl.BlockSpec((T, 4, mb_pad), lambda b, blk, ml: (0, 0, 0)),  # eps0
        pl.BlockSpec((NT, 4, mb_pad), lambda b, blk, ml: (0, 0, 0)),  # na
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (blk[b], 0, 0)),  # mave
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (blk[b], 0, 0)),  # msig
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (blk[b], 0, 0)),  # beta
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (blk[b], 0, 0)),  # comp
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (blk[b], 0, 0)),  # acum
        pl.BlockSpec((1, 1, B), lambda b, blk, ml: (blk[b], 0, 0)),  # grp
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (b, 0, 0)),      # u
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (b, 0, 0)),      # z
        pl.BlockSpec((T, G), lambda b, blk, ml: (0, 0)),            # sigmag
        pl.BlockSpec((K, T, G), lambda b, blk, ml: (0, 0, 0)),      # lc
        pl.BlockSpec((K, T, G), lambda b, blk, ml: (0, 0, 0)),      # rd
        pl.BlockSpec((K, T, G), lambda b, blk, ml: (0, 0, 0)),      # sqb
        pl.BlockSpec((T, 1), lambda b, blk, ml: (0, 0)),            # i2se
        pl.BlockSpec((T, 1), lambda b, blk, ml: (0, 0)),            # nonas
    ]
    out_specs = [
        pl.BlockSpec((T, 4, mb_pad), lambda b, blk, ml: (0, 0, 0)),
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (blk[b], 0, 0)),
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (blk[b], 0, 0)),
        pl.BlockSpec((1, T, B), lambda b, blk, ml: (blk[b], 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, 4, mb_pad), _F32),
        jax.ShapeDtypeStruct((nblocks, T, B), _F32),
        jax.ShapeDtypeStruct((nblocks, T, B), jnp.int32),
        jax.ShapeDtypeStruct((nblocks, T, B), _F32),
    ]
    scratch = [
        pltpu.VMEM((B, mb_pad), _BF16),                         # bedp
        pltpu.VMEM((T, 4, mb_pad), _F32),                       # eps_s
        pltpu.VMEM((NT, 2 * B, 2 * B), _F32),                   # gfull
        pltpu.VMEM((2 * T, 2 * B), _F32),                       # cab
        pltpu.VMEM((T * B, B), _F32),                           # gs
        pltpu.VMEM((T, B), _F32),                               # corr
        pltpu.VMEM((T, B), _F32),                               # dbeta
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=in_specs, out_specs=out_specs, scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )


def _sweep_kernel_tiled(
    blkidx_ref,      # (nblocks,) i32 scalar-prefetch
    mloc_ref,        # (1,) i32 scalar-prefetch
    # inputs (grid step (b, pass, j))
    bed_ref,         # (B, TJ) u8 — lane tile j of natural block blkidx[b]
    win_ref,         # (1, 1, B) i32
    gfull_ref,       # (1, NT, 2B, 2B) f32
    eps0_ref,        # (T, 4, TJ) f32 — tile j at (b=0, pass=0), parked else
    na_ref,          # (NT, 4, TJ) f32 — tile j in pass 1, parked else
    mave_ref,        # (1, T, B) f32, NATURAL block blkidx[b]
    msig_ref,        # (1, T, B) f32 natural
    beta_old_ref,    # (1, T, B) f32 natural
    comp_old_ref,    # (1, T, B) i32 natural
    acum_old_ref,    # (1, T, B) f32 natural
    grp_ref,         # (1, 1, B) i32 natural
    u_ref, z_ref,    # (1, T, B) f32, processing order
    sigmag_ref,      # (T, G) f32
    lc_ref,          # (K, T, G) f32
    rd_ref,          # (K, T, G) f32
    sqb_ref,         # (K, T, G) f32
    i2se_ref,        # (T, 1) f32
    nonas_ref,       # (T, 1) f32
    # outputs
    eps_out_ref,     # (T, 4, TJ) f32 — tile j at (b=nb-1, pass=1)
    beta_new_ref,    # (1, T, B) f32 natural
    comp_new_ref,    # (1, T, B) i32 natural
    acum_new_ref,    # (1, T, B) f32 natural
    # scratch
    bedp_s,          # (B, TJ) bf16: permuted tile
    eps_s,           # (T, 4, mb_pad) f32 — whole residual, persistent
    gfull_s,         # (NT, 2B, 2B) f32
    cab_s,           # (2T, 2B) f32
    gs_s,            # (T*B, B) f32
    corr_s,          # (T, B) f32
    dbeta_s,         # (T, B) f32
    lhs_s,           # (T, 2B) f32: update operand from the scan step
    *, n_mix: int, n_traits: int, wave: int, shared_na: bool,
    skip=frozenset(),
):
    """The whole-sweep mega-kernel with the individuals axis STREAMED:
    grid (nblocks, 2, n_lane_tiles).  Only a (B, TJ) bed tile is VMEM
    resident per step — the residual ``eps_s`` is the sole O(N) scratch —
    which lifts the resident kernel's N ceiling (~64k at B=128, T=4) to
    the UKB regime (N ~ 640k at T=4; reference loads bayes.cpp:875-879).

    Per block b: pass 0 streams bed tiles accumulating the residual dot
    products (same _LANES subtile order as the resident kernel — results
    are bit-identical); at (pass 1, tile 0) the shared prep + Gram-permute
    + wave-scan phase runs; pass 1 then re-streams the bed tiles applying
    the rank-W residual update to ``eps_s``.  The bed is read twice per
    block (vs once resident) — the price of O(TJ) residency.
    """
    b = pl.program_id(0)
    p = pl.program_id(1)
    j = pl.program_id(2)
    nb = pl.num_programs(0)
    T = n_traits
    B = bed_ref.shape[0]
    TJ = bed_ref.shape[1]
    K = n_mix
    W = wave
    TN = _LANES
    ntiles = TJ // TN
    off_j = j * TJ

    @pl.when((b == 0) & (p == 0))
    def _():
        eps_s[:, :, pl.ds(off_j, TJ)] = eps0_ref[...]

    # ---- within-block row shuffle of this bed tile (exact MXU one-hot) --
    perm_mat = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                == jnp.transpose(win_ref[0])).astype(_BF16)
    if "bedp" in skip:
        bedp_s[...] = bed_ref[...].astype(jnp.int32).astype(_BF16)
    else:
        bedp_s[...] = jax.lax.dot_general(
            perm_mat,
            bed_ref[...].astype(jnp.int32).astype(_BF16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=_F32).astype(_BF16)

    # ---- pass 0: accumulate the residual dot products -------------------
    @pl.when(p == 0)
    def _():
        @pl.when(j == 0)
        def _():
            cab_s[...] = jnp.zeros(cab_s.shape, _F32)

        def cab_tile(i, _):
            off = pl.multiple_of(i * TN, TN)
            bed_t = bedp_s[:, pl.ds(off, TN)]             # (B, TN) bf16
            full = jnp.ones((1, TN), bool)
            a, b2 = _decode_tile(bed_t, full)
            ab = jnp.concatenate([a, b2], axis=0)         # (2B, 4TN)
            eps_t = jnp.concatenate(
                [eps_s[:, k, pl.ds(off_j + off, TN)] for k in range(4)],
                axis=1)
            hi = eps_t.astype(_BF16)
            lo = (eps_t - hi.astype(_F32)).astype(_BF16)
            rhs = jnp.concatenate([hi, lo], axis=0)       # (2T, 4TN)
            cab_s[...] += jax.lax.dot_general(
                rhs, ab, (((1,), (1,)), ((), ())),
                preferred_element_type=_F32)
            return 0

        if "cab" not in skip:
            jax.lax.fori_loop(0, ntiles, cab_tile, 0)

    # ---- (pass 1, tile 0): prep + Gram permute + wave scan --------------
    @pl.when((p == 1) & (j == 0))
    def _():
        mave_p, msig_p = _block_scan_phase(
            blkidx_ref[b], mloc_ref[0], perm_mat,
            gfull_ref, mave_ref, msig_ref,
            beta_old_ref, comp_old_ref, acum_old_ref, grp_ref, u_ref,
            z_ref, sigmag_ref, lc_ref, rd_ref, sqb_ref, i2se_ref,
            nonas_ref,
            beta_new_ref, comp_new_ref, acum_new_ref,
            gfull_s, cab_s, gs_s, corr_s, dbeta_s,
            n_mix=K, n_traits=T, wave=W, shared_na=shared_na, skip=skip)
        dscaled = msig_p * dbeta_s[...]                   # (T, B)
        lhs_s[...] = jnp.concatenate(
            [dscaled, -(mave_p * dscaled)], axis=1)       # (T, 2B)

    # ---- pass 1: apply the rank-W residual update to this tile ----------
    @pl.when(p == 1)
    def _():
        lhs = lhs_s[...]
        hi = lhs.astype(_BF16)
        lo = (lhs - hi.astype(_F32)).astype(_BF16)
        lhs2 = jnp.concatenate([hi, lo], axis=0)          # (2T, 2B)

        def upd_tile(i, _):
            off = pl.multiple_of(i * TN, TN)
            bed_t = bedp_s[:, pl.ds(off, TN)]
            full = jnp.ones((1, TN), bool)
            a, b2 = _decode_tile(bed_t, full)
            ab = jnp.concatenate([a, b2], axis=0)
            out = jax.lax.dot_general(
                lhs2, ab, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32)              # (2T, 4TN)
            deps = out[:T] + out[T:]
            for k in range(4):
                if shared_na:
                    na_k = na_ref[0, k:k + 1, pl.ds(off, TN)]
                else:
                    na_k = na_ref[:, k, pl.ds(off, TN)]
                eps_s[:, k, pl.ds(off_j + off, TN)] += \
                    deps[:, k * TN:(k + 1) * TN] * na_k
            return 0

        if "update" not in skip:
            jax.lax.fori_loop(0, ntiles, upd_tile, 0)

    @pl.when((b == nb - 1) & (p == 1))
    def _():
        eps_out_ref[...] = eps_s[:, :, pl.ds(off_j, TJ)]


@functools.lru_cache(maxsize=None)
def _build_sweep_call_tiled(nblocks, B, mb_pad, T, K, W, G, shared_na,
                            interpret, skip=frozenset(), tj=0):
    NT = 1 if shared_na else T
    TJ = tj or pick_lane_tile(mb_pad)
    nj = mb_pad // TJ
    kern = functools.partial(_sweep_kernel_tiled, n_mix=K, n_traits=T,
                             wave=W, shared_na=shared_na, skip=skip)
    nb = nblocks

    def park_eps0(b, p, j, blk, ml):
        return (0, 0, jnp.where((b == 0) & (p == 0), j, 0))

    def park_na(b, p, j, blk, ml):
        return (0, 0, jnp.where(p == 1, j, 0))

    def park_eps_out(b, p, j, blk, ml):
        return (0, 0, jnp.where((b == nb - 1) & (p == 1), j, 0))

    natural = lambda b, p, j, blk, ml: (blk[b], 0, 0)    # noqa: E731
    blockwise = lambda b, p, j, blk, ml: (b, 0, 0)       # noqa: E731
    grid_const2 = lambda b, p, j, blk, ml: (0, 0)        # noqa: E731
    grid_const3 = lambda b, p, j, blk, ml: (0, 0, 0)     # noqa: E731
    in_specs = [
        pl.BlockSpec((B, TJ), lambda b, p, j, blk, ml: (blk[b], j)),  # bed
        pl.BlockSpec((1, 1, B), blockwise),                        # win
        pl.BlockSpec((1, NT, 2 * B, 2 * B),
                     lambda b, p, j, blk, ml: (blk[b], 0, 0, 0)),  # gfull
        pl.BlockSpec((T, 4, TJ), park_eps0),                       # eps0
        pl.BlockSpec((NT, 4, TJ), park_na),                        # na
        pl.BlockSpec((1, T, B), natural),                          # mave
        pl.BlockSpec((1, T, B), natural),                          # msig
        pl.BlockSpec((1, T, B), natural),                          # beta_old
        pl.BlockSpec((1, T, B), natural),                          # comp_old
        pl.BlockSpec((1, T, B), natural),                          # acum_old
        pl.BlockSpec((1, 1, B), natural),                          # grp
        pl.BlockSpec((1, T, B), blockwise),                        # u
        pl.BlockSpec((1, T, B), blockwise),                        # z
        pl.BlockSpec((T, G), grid_const2),                         # sigmag
        pl.BlockSpec((K, T, G), grid_const3),                      # lc
        pl.BlockSpec((K, T, G), grid_const3),                      # rd
        pl.BlockSpec((K, T, G), grid_const3),                      # sqb
        pl.BlockSpec((T, 1), grid_const2),                         # i2se
        pl.BlockSpec((T, 1), grid_const2),                         # nonas
    ]
    out_specs = [
        pl.BlockSpec((T, 4, TJ), park_eps_out),                    # eps_out
        pl.BlockSpec((1, T, B), natural),                          # beta_new
        pl.BlockSpec((1, T, B), natural),                          # comp_new
        pl.BlockSpec((1, T, B), natural),                          # acum_new
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, 4, mb_pad), _F32),
        jax.ShapeDtypeStruct((nblocks, T, B), _F32),
        jax.ShapeDtypeStruct((nblocks, T, B), jnp.int32),
        jax.ShapeDtypeStruct((nblocks, T, B), _F32),
    ]
    scratch = [
        pltpu.VMEM((B, TJ), _BF16),                             # bedp tile
        pltpu.VMEM((T, 4, mb_pad), _F32),                       # eps_s
        pltpu.VMEM((NT, 2 * B, 2 * B), _F32),                   # gfull
        pltpu.VMEM((2 * T, 2 * B), _F32),                       # cab
        pltpu.VMEM((T * B, B), _F32),                           # gs
        pltpu.VMEM((T, B), _F32),                               # corr
        pltpu.VMEM((T, B), _F32),                               # dbeta
        pltpu.VMEM((T, 2 * B), _F32),                           # lhs
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks, 2, nj),
        in_specs=in_specs, out_specs=out_specs, scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )


def vmem_fits_tiled(n_traits: int, block_size: int, mb_pad: int,
                    budget_bytes: int = 14 * 1024 * 1024,
                    nt: int = 1) -> bool:
    """VMEM feasibility of the N-tiled mega-kernel: the residual scratch
    (T x 4 x mb_pad f32) is the only O(N) term.  ``nt`` as in
    vmem_fits (the Gram buffers scale with it, not with T)."""
    TJ = pick_lane_tile(mb_pad)
    B = block_size
    T = n_traits
    eps_s = T * 4 * mb_pad * 4
    tiles = 2 * B * TJ + B * TJ * 2 + 3 * 2 * T * 4 * TJ * 4  # bed+bedp+eps io
    gram = 3 * nt * (2 * B) ** 2 * 4 + T * B * B * 4
    return eps_s + tiles + gram < budget_bytes


def gram_builder_fits(nt: int, block_size: int, mb_pad: int,
                      budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """VMEM feasibility of the PALLAS Gram-cache builder: (NT, 2B, 2B)
    f32 accumulator scratch + double-buffered same-size output blocks +
    the (B, tj) bed tile.  Beyond it build_gram_cache uses the
    bit-identical XLA builder (code-review r5: a bare B > 256 test
    missed the NT blow-up with per-trait NA masks)."""
    q = nt * (2 * block_size) ** 2 * 4
    bed = 2 * block_size * pick_lane_tile(mb_pad)
    return 3 * q + bed < budget_bytes


def sweep_blocks_pallas(
    bed, blkidx, win_p, m_local, gram_cache, eps0, na,
    mave, msig, beta_old, comp_old, acum_old, grp,
    u_p, z_p, sigmag, lc_tab, rd_tab, sqb_tab, i2se, nonas_col,
    *, wave: int, shared_na: bool, interpret: bool = False,
    tiled: bool = False,
):
    """Run the whole-sweep mega-kernel.

    bed (nblocks*B, mb_pad) u8 in NATURAL order; blkidx (nblocks,) i32 the
    processing order of natural blocks (scalar-prefetched into the DMA
    index map); win_p (nblocks, B) i32 the within-block row shuffle;
    m_local () i32; eps0/na (T|1, 4, mb_pad) f32; mave/msig/beta_old/
    comp_old/acum_old (T, m_pad) and grp (m_pad,) in NATURAL order (all
    processing-order prep happens in-kernel — _block_scan_phase); u_p/z_p
    (nblocks, T, B) in processing order; sigmag (T, G) and lc/rd/sqb
    (K, T, G) the group-level scan tables (build_sweep_tables).
    Returns (eps_out, beta_new, comp_new, acum_new) with the marker-state
    outputs already in NATURAL (T, m_pad) order.  Marker streams are
    reshaped to (nblocks, 1|T, B) here because Mosaic requires block last
    dims divisible by (8, 128) or equal to the array's — (1, T, B)
    blocks satisfy that at any B.
    """
    T, m_pad = beta_old.shape
    K = rd_tab.shape[0]
    G = rd_tab.shape[2]
    nblocks, B = win_p.shape
    mb_pad = bed.shape[1]
    assert mb_pad % _LANES == 0, "pad packed columns to the lane tile"
    assert bed.shape[0] == nblocks * B == m_pad
    # The in-kernel win recovery (iota @ P) carries row indices through
    # bf16 base-256 digits — exact to B = 65536; the binding ceiling is
    # VMEM: the (2B)^2 f32 Gram quadrants are 4.2 MB at B=512 and
    # 16.8 MB at B=1024, over the 16 MB scoped limit.
    assert B <= 512, "fused-path block size is limited to 512 (VMEM)"
    # Group ids ride the same bf16 one-hot permutes (_permute_cols_small,
    # exact < 256) and select_g unrolls a where per group.
    assert G <= 256, "group count is limited to 256 (bf16 id carry)"
    if "call" in DEBUG_SKIP:
        # Profiling: XLA-glue-only floor — the kernel is not launched.
        z = jnp.zeros((T, m_pad), _F32)
        return (eps0.astype(_F32), z, z.astype(jnp.int32), z)
    if tiled:
        call = _build_sweep_call_tiled(
            nblocks, B, mb_pad, T, K, wave, G, bool(shared_na),
            resolve_interpret(interpret or FORCE_INTERPRET),
            DEBUG_SKIP, pick_lane_tile(mb_pad))
    else:
        call = _build_sweep_call(
            nblocks, B, mb_pad, T, K, wave, G, bool(shared_na),
            resolve_interpret(interpret or FORCE_INTERPRET),
            DEBUG_SKIP)
    na_in = na[:1] if shared_na else na

    def nat3(x, dt):   # (T, m_pad) -> (nblocks, T, B)
        return jnp.moveaxis(x.astype(dt).reshape(T, nblocks, B), 1, 0)

    eps_out, beta3, comp3, acum3 = call(
        blkidx.astype(jnp.int32),
        jnp.asarray(m_local, jnp.int32).reshape(1),
        bed, win_p.astype(jnp.int32).reshape(nblocks, 1, B),
        gram_cache.astype(_F32),
        eps0.astype(_F32), na_in.astype(_F32),
        nat3(mave, _F32), nat3(msig, _F32),
        nat3(beta_old, _F32), nat3(comp_old, jnp.int32),
        nat3(acum_old, _F32),
        grp.astype(jnp.int32).reshape(nblocks, 1, B),
        u_p.astype(_F32), z_p.astype(_F32),
        sigmag.astype(_F32),
        lc_tab.astype(_F32), rd_tab.astype(_F32), sqb_tab.astype(_F32),
        i2se.astype(_F32), nonas_col.astype(_F32),
    )

    def unnat(y):      # (nblocks, T, B) -> (T, m_pad)
        return jnp.moveaxis(y, 0, 1).reshape(T, m_pad)

    return eps_out, unnat(beta3), unnat(comp3), unnat(acum3)


def build_sweep_tables(sigmag, sigmae, pi_est, cva, cvai, nonas, n_total):
    """GROUP-level scan tables (K, T, G) for the mega-kernel — the
    scan_kernel_wave per-marker prep collapsed to group granularity: lc/
    rd/sqb depend on a marker only through its group, so the kernel
    selects per-marker values by group id (exact copies) and the former
    per-iteration (nblocks, K, T, B) XLA prep streams disappear.  The
    arithmetic matches make_block_scan_wave exactly so values stay
    bit-identical to the composed path."""
    f32 = _F32
    T = sigmag.shape[0]
    G, K = cva.shape
    sigmae_f = sigmae.astype(f32)[:, None]                 # (T, 1)
    nonas_f = nonas.astype(f32)[:, None]
    n_total_f = jnp.asarray(n_total, f32)

    sg = sigmag.astype(f32)                                # (T, G)
    adav = sg == 0.0
    sg_safe = jnp.where(adav, 1.0, sg)
    sige_g = sigmae_f / sg_safe
    sigg_e = sg_safe / sigmae_f

    cvai_b = cvai.astype(f32)[:, 1:]                       # (G, K-1)
    cva_b = cva.astype(f32)[:, 1:]
    denom = (n_total_f - 1.0) + sige_g[:, :, None] * cvai_b[None]
    zeros0 = jnp.zeros((T, G, 1), f32)
    rd = jnp.concatenate([zeros0, 1.0 / denom], axis=2)    # (T, G, K)
    sqb = jnp.concatenate(
        [zeros0, jnp.sqrt(sigmae_f[:, :, None] / denom)], axis=2)

    logpi = jnp.log(pi_est.astype(f32))                    # (T, G, K)
    tail = -0.5 * jnp.log(
        sigg_e[:, :, None] * (nonas_f[:, :, None] - 1.0) * cva_b[None] + 1.0)
    lc = logpi.at[:, :, 1:].add(tail)

    def ktg(x):
        return jnp.transpose(x, (2, 0, 1))
    return ktg(lc), ktg(rd), ktg(sqb)


# --------------------------------------------------------------------------
# Fused per-block kernel (the sharded sweep's unit of work)
# --------------------------------------------------------------------------

def _block_sweep_kernel(
    blk_b_ref,       # (1,) i32 SMEM: natural block id
    mloc_ref,        # (1,) i32 SMEM: real local marker count
    bed_ref,         # (B, mb_pad) u8 — natural block blk_b
    win_ref,         # (1, 1, B) i32
    gfull_ref,       # (1, NT, 2B, 2B) f32 cached raw Gram of this block
    eps_ref,         # (T, 4, mb_pad) f32 current residual
    na_ref,          # (NT, 4, mb_pad) f32
    mave_ref,        # (1, T, B) f32 natural
    msig_ref,        # (1, T, B) f32 natural
    beta_old_ref,    # (1, T, B) f32 natural
    comp_old_ref,    # (1, T, B) i32 natural
    acum_old_ref,    # (1, T, B) f32 natural
    grp_ref,         # (1, 1, B) i32 natural
    u_ref, z_ref,    # (1, T, B) f32 processing order
    sigmag_ref,      # (T, G) f32
    lc_ref,          # (K, T, G) f32
    rd_ref,          # (K, T, G) f32
    sqb_ref,         # (K, T, G) f32
    i2se_ref,        # (T, 1) f32
    nonas_ref,       # (T, 1) f32
    # outputs
    deps_ref,        # (T, 4, mb_pad) f32: this block's residual delta
    beta_new_ref,    # (1, T, B) f32 natural
    comp_new_ref,    # (1, T, B) i32 natural
    acum_new_ref,    # (1, T, B) f32 natural
    # scratch
    bedp_s, gfull_s, cab_s, gs_s, corr_s, dbeta_s,
    *, n_mix: int, n_traits: int, wave: int, shared_na: bool,
):
    """ONE block's full compute in one pallas_call — the sharded sweep's
    per-block unit (gibbs.marker_sweep fused path).  Identical math and
    accumulation structure to the whole-sweep mega-kernel, but the
    residual arrives as an input and leaves as a DELTA so the caller can
    psum it across devices at the unchanged per-block cadence
    (reference protocol, bayes.cpp:500-553).  Replaces the composed
    3-kernel + XLA-glue chain that made the pod path ~2.5x slower than
    the mega path per block."""
    T = n_traits
    B = bed_ref.shape[0]
    mb_pad = bed_ref.shape[1]
    K = n_mix
    W = wave
    TN = _LANES
    ntiles = mb_pad // TN

    perm_mat = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                == jnp.transpose(win_ref[0])).astype(_BF16)
    bedp_s[...] = jax.lax.dot_general(
        perm_mat,
        bed_ref[...].astype(jnp.int32).astype(_BF16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=_F32).astype(_BF16)

    cab_s[...] = jnp.zeros(cab_s.shape, _F32)

    def cab_tile(i, _):
        off = pl.multiple_of(i * TN, TN)
        bed_t = bedp_s[:, pl.ds(off, TN)]
        full = jnp.ones((1, TN), bool)
        a, b2 = _decode_tile(bed_t, full)
        ab = jnp.concatenate([a, b2], axis=0)
        eps_t = jnp.concatenate(
            [eps_ref[:, k, pl.ds(off, TN)] for k in range(4)], axis=1)
        hi = eps_t.astype(_BF16)
        lo = (eps_t - hi.astype(_F32)).astype(_BF16)
        rhs = jnp.concatenate([hi, lo], axis=0)
        cab_s[...] += jax.lax.dot_general(
            rhs, ab, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32)
        return 0

    jax.lax.fori_loop(0, ntiles, cab_tile, 0)

    mave_p, msig_p = _block_scan_phase(
        blk_b_ref[0], mloc_ref[0], perm_mat,
        gfull_ref, mave_ref, msig_ref,
        beta_old_ref, comp_old_ref, acum_old_ref, grp_ref, u_ref, z_ref,
        sigmag_ref, lc_ref, rd_ref, sqb_ref, i2se_ref, nonas_ref,
        beta_new_ref, comp_new_ref, acum_new_ref,
        gfull_s, cab_s, gs_s, corr_s, dbeta_s,
        n_mix=K, n_traits=T, wave=W, shared_na=shared_na,
        skip=frozenset())

    dscaled = msig_p * dbeta_s[...]
    lhs = jnp.concatenate([dscaled, -(mave_p * dscaled)], axis=1)
    hi = lhs.astype(_BF16)
    lo = (lhs - hi.astype(_F32)).astype(_BF16)
    lhs2 = jnp.concatenate([hi, lo], axis=0)

    def upd_tile(i, _):
        off = pl.multiple_of(i * TN, TN)
        bed_t = bedp_s[:, pl.ds(off, TN)]
        full = jnp.ones((1, TN), bool)
        a, b2 = _decode_tile(bed_t, full)
        ab = jnp.concatenate([a, b2], axis=0)
        out = jax.lax.dot_general(
            lhs2, ab, (((1,), (0,)), ((), ())),
            preferred_element_type=_F32)
        deps = out[:T] + out[T:]
        for k in range(4):
            if shared_na:
                na_k = na_ref[0, k:k + 1, pl.ds(off, TN)]
            else:
                na_k = na_ref[:, k, pl.ds(off, TN)]
            deps_ref[:, k, pl.ds(off, TN)] = \
                deps[:, k * TN:(k + 1) * TN] * na_k
        return 0

    jax.lax.fori_loop(0, ntiles, upd_tile, 0)


@functools.lru_cache(maxsize=None)
def _build_block_sweep_call(B, mb_pad, T, K, W, G, shared_na, interpret,
                            vma=None):
    from gmrm_tpu.ops.pallas_kernels import sds
    NT = 1 if shared_na else T
    kern = functools.partial(_block_sweep_kernel, n_mix=K, n_traits=T,
                             wave=W, shared_na=shared_na)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        in_specs=[smem, smem] + [vmem] * 19,
        out_specs=[vmem] * 4,
        out_shape=[
            sds((T, 4, mb_pad), _F32, vma),
            sds((1, T, B), _F32, vma),
            sds((1, T, B), jnp.int32, vma),
            sds((1, T, B), _F32, vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, mb_pad), _BF16),
            pltpu.VMEM((NT, 2 * B, 2 * B), _F32),
            pltpu.VMEM((2 * T, 2 * B), _F32),
            pltpu.VMEM((T * B, B), _F32),
            pltpu.VMEM((T, B), _F32),
            pltpu.VMEM((T, B), _F32),
        ],
        interpret=interpret,
    )


def block_sweep_pallas(
    blk_b, m_local, bed_blk, win_blk, gfull_blk, eps, na,
    mave_blk, msig_blk, beta_blk, comp_blk, acum_blk, grp_blk,
    u_blk, z_blk, sigmag, lc_tab, rd_tab, sqb_tab, i2se, nonas_col,
    *, wave: int, shared_na: bool, interpret: bool = False,
    axis_name=None,
):
    """One fused per-block sweep step (see _block_sweep_kernel).

    All block operands are NATURAL-order slices: bed_blk (B, mb_pad) u8,
    gfull_blk (1, NT, 2B, 2B), mave/msig/beta/comp/acum (T, B), grp (B,),
    win/u/z processing-order.  Returns (deps, beta_new, comp_new,
    acum_new) with deps (T, 4, mb_pad) ready for the cross-device psum.
    """
    from gmrm_tpu.ops.pallas_kernels import out_vma, shard_varying
    B, mb_pad = bed_blk.shape
    T = eps.shape[0]
    K, _, G = rd_tab.shape
    assert B <= 512, \
        "fused-path block size is limited to 512 (VMEM Gram quadrants)"
    assert G <= 256, "group count is limited to 256 (bf16 id carry)"
    call = _build_block_sweep_call(
        B, mb_pad, T, K, wave, G, bool(shared_na),
        resolve_interpret(interpret or FORCE_INTERPRET),
        out_vma(axis_name))
    na_in = na[:1] if shared_na else na
    args = shard_varying(
        axis_name,
        jnp.asarray(blk_b, jnp.int32).reshape(1),
        jnp.asarray(m_local, jnp.int32).reshape(1),
        bed_blk, win_blk.astype(jnp.int32).reshape(1, 1, B),
        gfull_blk.astype(_F32),
        eps.astype(_F32), na_in.astype(_F32),
        mave_blk.astype(_F32).reshape(1, T, B),
        msig_blk.astype(_F32).reshape(1, T, B),
        beta_blk.astype(_F32).reshape(1, T, B),
        comp_blk.astype(jnp.int32).reshape(1, T, B),
        acum_blk.astype(_F32).reshape(1, T, B),
        grp_blk.astype(jnp.int32).reshape(1, 1, B),
        u_blk.astype(_F32).reshape(1, T, B),
        z_blk.astype(_F32).reshape(1, T, B),
        sigmag.astype(_F32),
        lc_tab.astype(_F32), rd_tab.astype(_F32), sqb_tab.astype(_F32),
        i2se.astype(_F32), nonas_col.astype(_F32),
    )
    deps, beta_new, comp_new, acum_new = call(*args)
    return (deps, beta_new.reshape(T, B), comp_new.reshape(T, B),
            acum_new.reshape(T, B))


# --------------------------------------------------------------------------
# One-time Gram cache builder
# --------------------------------------------------------------------------

def _gram_cache_kernel(bed_ref, na_ref, out_ref, gfull_s,
                       *, n_traits, shared_na):
    """Raw Gram quadrants of one natural block, with the EXACT tile-loop
    accumulation structure of the in-kernel Gram it replaces (same _LANES
    tiles, same f32 partial sums), so downstream results stay bit-identical
    to the recompute-every-iteration variant.

    Grid is (nblocks, n_lane_tiles): the individuals axis streams through
    VMEM in ``tj``-byte tiles (pick_lane_tile), so the builder has no
    N ceiling — only the (B, tj) bed tile is resident, the accumulator
    persists across the inner grid axis.
    """
    T = n_traits
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    tj = bed_ref.shape[1]
    TN = _LANES
    ntiles = tj // TN

    @pl.when(j == 0)
    def _():
        gfull_s[...] = jnp.zeros(gfull_s.shape, _F32)

    def tile(i, _):
        off = pl.multiple_of(i * TN, TN)
        bed_t = bed_ref[:, pl.ds(off, TN)]               # (B, TN) u8
        full = jnp.ones((1, TN), bool)
        a, b2 = _decode_tile(bed_t, full)                # (B, 4TN) bf16
        ab = jnp.concatenate([a, b2], axis=0)            # (2B, 4TN)
        nt_range = 1 if shared_na else T
        for t in range(nt_range):
            na_t = jnp.concatenate(
                [na_ref[t, k:k + 1, pl.ds(off, TN)] for k in range(4)],
                axis=1).astype(_BF16)                    # (1, 4TN)
            gfull_s[t] += jax.lax.dot_general(
                ab * na_t, ab, (((1,), (1,)), ((), ())),
                preferred_element_type=_F32)
        return 0

    jax.lax.fori_loop(0, ntiles, tile, 0)

    @pl.when(j == nj - 1)
    def _():
        out_ref[0] = gfull_s[...]


@functools.lru_cache(maxsize=None)
def _build_gram_cache_call(nblocks, B, mb_pad, T, shared_na, interpret,
                           tj=0):
    NT = 1 if shared_na else T
    tj = tj or pick_lane_tile(mb_pad)
    nj = mb_pad // tj
    kern = functools.partial(_gram_cache_kernel, n_traits=T,
                             shared_na=shared_na)
    return pl.pallas_call(
        kern, grid=(nblocks, nj),
        in_specs=[
            pl.BlockSpec((B, tj), lambda b, j: (b, j)),          # bed
            pl.BlockSpec((NT, 4, tj), lambda b, j: (0, 0, j)),   # na
        ],
        out_specs=pl.BlockSpec((1, NT, 2 * B, 2 * B),
                               lambda b, j: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nblocks, NT, 2 * B, 2 * B), _F32),
        scratch_shapes=[pltpu.VMEM((NT, 2 * B, 2 * B), _F32)],
        interpret=interpret,
    )


def _gram_cache_xla(bed, na_in, block_size):
    """XLA (non-pallas) Gram-cache builder for B > 256, where the pallas
    builder's (NT, 2B, 2B) scratch + output residency exceeds VMEM
    (measured: B=512 needs 23.4M vs the 16M scoped limit).

    BIT-IDENTICAL to the pallas builder: every Gram entry is an exact
    non-negative integer count < 2^24 (codes <= 2 and na in {0,1} are
    exact in bf16, so every product is; f32 MXU accumulation of exact
    integers below 2^24 is order-independent), so the reduction
    structure doesn't matter — only the decoded values, which share
    the mk_lut.cpp:25-36 code map.  bf16 operands + a single-pass
    preferred-f32 einsum, NOT Precision.HIGHEST (6 bf16 passes for the
    same bits at 6x the MXU work — the tradeoff blockops documents)."""
    from gmrm_tpu.ops.decode import decode_planes_jax
    m_pad, mb_pad = bed.shape
    B = block_size
    nblocks = m_pad // B
    NT = na_in.shape[0]
    na_b = na_in.astype(_BF16)

    def per_block(bed_blk):                       # (B, mb_pad) u8
        a, b = decode_planes_jax(bed_blk, dtype=_BF16)
        ab = jnp.concatenate([a, b], axis=0)      # (2B, 4, mb_pad) bf16
        gs = [
            jnp.einsum("ikm,jkm->ij", ab * na_b[t][None], ab,
                       preferred_element_type=_F32)
            for t in range(NT)
        ]
        return jnp.stack(gs)                      # (NT, 2B, 2B)

    return jax.lax.map(per_block, bed.reshape(nblocks, B, mb_pad))


def build_gram_cache(bed, na, *, block_size, shared_na, interpret=False):
    """Precompute raw Gram quadrants for every natural block.

    bed (m_pad, mb_pad) u8 natural order; na (T, 4, mb_pad).
    Returns (nblocks, NT, 2B, 2B) f32.  O(M N B) once; the per-iteration
    mega-kernel then pays only an O(M B^2) load+permute (HBM cost
    M*2048/B bytes per iteration at B=128).
    """
    m_pad, mb_pad = bed.shape
    assert m_pad % block_size == 0
    assert mb_pad % _LANES == 0
    nblocks = m_pad // block_size
    T = na.shape[0]
    na_in = na[:1] if shared_na else na
    if not gram_builder_fits(na_in.shape[0], block_size, mb_pad):
        return _gram_cache_xla(bed, na_in.astype(_F32), block_size)
    call = _build_gram_cache_call(
        nblocks, block_size, mb_pad, T, bool(shared_na),
        resolve_interpret(interpret or FORCE_INTERPRET),
        pick_lane_tile(mb_pad))
    return call(bed, na_in.astype(_F32))
