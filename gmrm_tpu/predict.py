"""Posterior prediction / association statistics (the reference's
``--predict`` mode, ``src/bayes.cpp:16-284``).

Per phenotype:

1. read the ``.bet`` chain written by training, average over iterations;
2. genetic values g = X_std @ beta_mean over markers present in the
   reference panel bim (``bayes.cpp:93-125``);
3. residualize: y_k = y_centered_scaled - (g - g_k) — with a single shard
   g_k == g so y_k == y, exactly the reference's 1-rank behavior
   (``bayes.cpp:138-147``); sigma = sum(y_k^2)/nonas;
4. per-marker OLS on *uncentered* dosages (a*b*na — a faithful reference
   quirk, ``bayes.cpp:191-205``): beta = xty/xtx, t = xty/sqrt(sigma*xtx),
   se = beta/t, p = 1 - P(1/2, t^2/2);
5. fixed-width ``.mlma`` lines, markers absent from the reference bim
   excluded (``bayes.cpp:223-254``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from gmrm_tpu.config import Options
from gmrm_tpu.io.bed import read_bed
from gmrm_tpu.io.bim import read_bim_ids, bim_id_index
from gmrm_tpu.io.grouping import read_dim
from gmrm_tpu.io.phen import read_phen
from gmrm_tpu.io.writers import read_history, format_mlma_line
from gmrm_tpu.ops.decode import decode_planes_jax, to_phase_planes
from gmrm_tpu.ops.blockops import marker_stats_jax, _PREC
from gmrm_tpu.runner import stem


def _predict_sums_scan(bed_p, mave_p, msig_p, beta_p, keep_p, na, y_planes,
                       *, dtype, axis_name=None):
    """The fused scan over marker chunks (pure; jitted via
    _predict_sums_jit for the single-device path so repeated calls —
    per trait, per run — hit the jit cache instead of recompiling:
    closing over na/y_planes as constants caused a ~3 s XLA recompile
    per trait)."""
    def body(carry, xs):
        g_acc = carry
        bed_c, mave_c, msig_c, beta_c, keep_c = xs
        a, b = decode_planes_jax(bed_c, dtype=dtype)       # (chunk, 4, mb)
        xstd = (a - mave_c[:, None, None] * b) * na[None] * \
            msig_c[:, None, None]                          # (chunk, 4, mb)
        w = beta_c * keep_c
        g_acc = g_acc + jnp.einsum("c,ckm->km", w, xstd,
                                   preferred_element_type=dtype,
                                   precision=_PREC)
        val = a * b * na[None]                             # uncentered dosage
        xtx = jnp.einsum("ckm,ckm->c", val, val,
                         preferred_element_type=dtype, precision=_PREC)
        xty = jnp.einsum("ckm,km->c", val, y_planes,
                         preferred_element_type=dtype, precision=_PREC)
        return g_acc, (xtx, xty)

    g0 = jnp.zeros(na.shape, dtype)
    if axis_name is not None:
        # Under shard_map the carry absorbs shard-varying inputs.
        g0 = jax.lax.pcast(g0, (axis_name,), to="varying")
    g, (xtx, xty) = jax.lax.scan(body, g0,
                                 (bed_p, mave_p, msig_p, beta_p, keep_p))
    return g, xtx, xty


@functools.partial(jax.jit, static_argnames=("dtype",))
def _predict_sums_jit(bed_p, mave_p, msig_p, beta_p, keep_p, na, y_planes,
                      dtype):
    return _predict_sums_scan(bed_p, mave_p, msig_p, beta_p, keep_p,
                              na, y_planes, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("dtype",))
def _stats_jit(bed, na, nonas, dtype):
    # jit wrapper: marker_stats_jax's eager scan would recompile per
    # trait (fresh na constants); here the cache keys on shapes.
    return marker_stats_jax(bed, na, nonas, dtype=dtype)


def _chunked_predict_sums(bed, na, mave, msig, beta_mean, y_planes,
                          keep, dtype=jnp.float32, chunk=512,
                          axis_name=None):
    """One fused pass: g = sum_j keep_j*beta_j*x_std_j  and per-marker
    (xtx, xty) on uncentered dosages against y_k."""
    m, mb = bed.shape
    n_chunks = -(-m // chunk)
    m_pad = n_chunks * chunk
    pad = m_pad - m

    def padm(x, fill=0):
        return jnp.concatenate(
            [jnp.asarray(x), jnp.full((pad,) + np.shape(x)[1:], fill,
                                      jnp.asarray(x).dtype)])

    bed_p = jnp.concatenate(
        [jnp.asarray(bed),
         jnp.full((pad, mb), 0x55, jnp.uint8)]).reshape(n_chunks, chunk, mb)
    xs = (
        bed_p,
        padm(mave).reshape(n_chunks, chunk).astype(dtype),
        padm(msig).reshape(n_chunks, chunk).astype(dtype),
        padm(beta_mean).reshape(n_chunks, chunk).astype(dtype),
        padm(keep.astype(np.float32)).reshape(n_chunks, chunk).astype(dtype),
    )
    if axis_name is not None:
        g, xtx, xty = _predict_sums_scan(*xs, na, y_planes, dtype=dtype,
                                         axis_name=axis_name)
    else:
        g, xtx, xty = _predict_sums_jit(*xs, na, y_planes, dtype=dtype)
    return g, xtx.reshape(-1)[:m], xty.reshape(-1)[:m]


def _beta_mean_streamed(bet_path: str, expect_mtot: int, start: int = 0,
                        count: int | None = None):
    """Posterior-mean betas, one record at a time (never holds the whole
    chain — reference reads per-iteration too, bayes.cpp:69-80).

    ``start``/``count`` select this process's marker slice — the
    per-rank positioned .bet read of distributed predict
    (reference MPI_File_read_at_all, bayes.cpp:69-80)."""
    from gmrm_tpu.io.writers import history_mtot, read_history_stream
    mtot = history_mtot(bet_path)
    if mtot != expect_mtot:
        raise IOError(
            f"Mismatch between expected and Mtot read from .bet file: "
            f"{expect_mtot} vs {mtot}"
        )
    if count is None:
        count = mtot - start
    acc = np.zeros(count, np.float64)
    niter = 0
    for _, rec in read_history_stream(bet_path, "f8", start, count):
        acc += rec
        niter += 1
    return acc / max(niter, 1), niter


def _sharded_predict_sums(bed, na, mave, msig, beta_mean, y_planes, keep,
                          n_devices, dtype=jnp.float32):
    """The X.beta / OLS pass over a marker-sharded device mesh: each shard
    computes its markers' (xtx, xty) and partial genetic value g; psum(g)
    replaces the reference's MPI_Allreduce (bayes.cpp:136).  Per-marker
    sums never cross shards, so the outputs are byte-identical to the
    single-device pass."""
    from jax.sharding import PartitionSpec as P
    from gmrm_tpu.parallel.mesh import MARKER_AXIS, make_marker_mesh

    mesh = make_marker_mesh(n_devices)
    d = mesh.devices.size
    m, mb = bed.shape
    m_pad = -(-m // d) * d
    pad = m_pad - m

    bed_p = np.concatenate(
        [bed, np.full((pad, mb), 0x55, np.uint8)], axis=0)
    mave_p = np.concatenate([mave, np.zeros(pad)])
    msig_p = np.concatenate([msig, np.zeros(pad)])
    beta_p = np.concatenate([beta_mean, np.zeros(pad)])
    keep_p = np.concatenate([keep.astype(np.float64), np.zeros(pad)])

    def shard_fn(bed_s, mave_s, msig_s, beta_s, keep_s, na_r, y_r):
        g_k, xtx, xty = _chunked_predict_sums(
            bed_s, na_r, mave_s, msig_s, beta_s, y_r,
            keep_s, dtype=dtype, axis_name=MARKER_AXIS)
        g = jax.lax.psum(g_k, MARKER_AXIS)
        return g, xtx, xty

    sh = P(MARKER_AXIS)
    rep = P()
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(sh, sh, sh, sh, sh, rep, rep),
        out_specs=(rep, sh, sh),
    ))
    g, xtx, xty = fn(
        jnp.asarray(bed_p), jnp.asarray(mave_p, dtype),
        jnp.asarray(msig_p, dtype), jnp.asarray(beta_p, dtype),
        jnp.asarray(keep_p, dtype), na, y_planes,
    )
    return g, np.asarray(xtx)[:m], np.asarray(xty)[:m]


def run_predict(opt: Options, verbose: bool = True):
    """Produce <out_dir>/<phen-stem>.mlma for every phenotype.

    Runs marker-sharded over all visible devices (reference predict is
    MPI-parallel the same way, bayes.cpp:93-136); a single device gives
    the identical bytes.

    Multi-process: each process handles its contiguous marker block
    (reference per-rank partition, bayes.cpp:903-925) — it reads only its
    .bed and .bet slices and writes its own fixed-width .mlma line range
    at the exact byte offsets (the reference's per-rank
    MPI_File_write_at with Allgathered line counts, bayes.cpp:223-254).
    Per-marker statistics never cross markers and y_k == y in the 1-rank
    semantics (below), so the bytes are identical for any process count.
    """
    opt.validate()
    n, m_total = read_dim(opt.dim_file)
    if opt.trunc_markers:
        m_total = min(m_total, opt.trunc_markers)
    rsid = read_bim_ids(opt.bim_file)
    ref_idx = bim_id_index(opt.ref_bim_file)

    nproc = jax.process_count()
    pid = jax.process_index()
    if nproc > 1:
        from gmrm_tpu.parallel.mesh import marker_blocks
        s0, m_loc = marker_blocks(m_total, nproc)[pid]
    else:
        s0, m_loc = 0, m_total

    bed = read_bed(opt.bed_file, n, m_total, s0, m_loc)
    dtype = jnp.dtype(opt.dtype)
    n_dev = opt.n_devices or len(jax.local_devices())

    # Reference-panel membership over ALL markers (every process reads the
    # small .bim files): line numbers in the .mlma are global prefix
    # counts of kept markers, the Allgathered offsets of bayes.cpp:237-247.
    keep_all = np.array([rid in ref_idx for rid in rsid[:m_total]])
    rmglo_all = np.array([ref_idx.get(rid, -1) for rid in rsid[:m_total]])
    line_no = np.cumsum(keep_all) - 1                  # global line index
    n_keep = int(keep_all.sum())
    keep = keep_all[s0:s0 + m_loc]
    rmglo = rmglo_all[s0:s0 + m_loc]

    from gmrm_tpu.io.writers import MLMA_LINE_LEN
    from gmrm_tpu.parallel.runner import _sync_processes

    for phen_path in opt.phen_files:
        ph = read_phen(phen_path, n)
        base = os.path.join(opt.out_dir, stem(phen_path))
        bet_path = base + ".bet"
        beta_mean, niter = _beta_mean_streamed(bet_path, len(ref_idx),
                                               s0, m_loc)
        if verbose and pid == 0:
            print(f"INFO   : Number of recorded iterations in .bet file: "
                  f"{niter}")

        na = jnp.asarray(to_phase_planes(ph.na_vector_padded()), dtype)
        # Stats stay ON DEVICE — they feed only the sums pass, and every
        # host fetch on a tunneled device costs a full sync round-trip.
        mave, msig = _stats_jit(
            jnp.asarray(bed), na[None],
            jnp.asarray([ph.nonas], dtype), dtype=dtype)
        mave = mave[0]
        msig = msig[0]

        y = ph.epsilon_padded()                             # centered+scaled
        y_planes = jnp.asarray(to_phase_planes(y), dtype)

        if n_dev > 1 and nproc == 1:
            g, xtx, xty = _sharded_predict_sums(
                bed, na, mave, msig, beta_mean, y_planes, keep,
                n_devices=opt.n_devices, dtype=dtype)
        else:
            g, xtx, xty = _chunked_predict_sums(
                bed, na, mave, msig, beta_mean, y_planes, keep,
                dtype=dtype)
        # Single shard: g_k == g, so y_k = y (reference 1-rank behavior;
        # the sharded/multi-process passes keep the same semantics so
        # outputs are byte-identical across layouts).
        sigma = float(np.asarray(y) @ np.asarray(y)) / ph.nonas

        # ONE stacked device fetch per trait (each fetched array costs a
        # sync round-trip on a tunneled device), then float64 OLS on the
        # host like the reference (bayes.cpp:191-205).
        xx = np.asarray(jnp.stack([xtx, xty]), np.float64)
        xtx, xty = xx[0], xx[1]
        with np.errstate(divide="ignore", invalid="ignore"):
            beta = xty / xtx
            tdist = xty / np.sqrt(sigma * xtx)
            se = beta / tdist
        # p = 1 - P(1/2, t^2/2) = erfc(|t|/sqrt(2)) exactly (the
        # reference evaluates the same regularized gamma via boost,
        # bayes.cpp:202-205); math.erfc gives it in float64 with no
        # device round-trip.
        import math
        erfc_v = np.frompyfunc(math.erfc, 1, 1)
        with np.errstate(invalid="ignore"):
            pval = erfc_v(np.abs(tdist) / np.sqrt(2.0)).astype(np.float64)
        pval = np.where(np.isfinite(tdist), pval, np.nan)

        mlma_path = base + ".mlma"
        if pid == 0:
            if os.path.exists(mlma_path):
                os.remove(mlma_path)
            with open(mlma_path, "wb") as fh:
                fh.truncate(n_keep * MLMA_LINE_LEN)
        _sync_processes("mlma-create")
        with open(mlma_path, "r+b") as fh:
            for jl in range(m_loc):
                j = s0 + jl
                if not keep[jl]:
                    print(f"WARNING: marker id {rsid[j]} excluded -- "
                          f"no match")
                    continue
                fh.seek(int(line_no[j]) * MLMA_LINE_LEN)
                fh.write(format_mlma_line(
                    rsid[j], j, int(rmglo[jl]), beta[jl], tdist[jl],
                    se[jl], pval[jl]).encode())
        _sync_processes("mlma-done")
        if verbose and pid == 0:
            print(f"INFO   : wrote {n_keep} markers to {mlma_path}")
