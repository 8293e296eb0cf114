"""Fused block operations: the MXU-facing compute path of the sampler.

These three ops carry all the O(N) work of the Gibbs sweep (the reference's
hot loops: dot product ``src/bayes.cpp:709-770``, rank-1 residual update
``src/phenotype.cpp:326-393``, marker statistics
``src/phenotype.cpp:466-556``), restructured as block matmuls:

- ``block_gram``: for a block of B markers, compute ``c = Xc @ eps`` and the
  NA-masked Gram matrix ``G = (Xc*na) @ Xc^T`` with the 2-bit decode fused
  in.  These two quantities make the within-block serial scan O(B) per
  marker instead of O(N).
- ``block_eps_update``: apply the accumulated rank-1 updates of a block as
  one matvec ``eps += Xc^T @ (msig*dbeta) * na``.
- ``marker_stats_jax``: one fused pass for per-marker mean / inverse-sd.

This module is the pure-XLA reference path (it materializes the decoded
block); gmrm_tpu.ops.pallas_kernels provides the streaming Pallas variant
for large N and is tested against this one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# This JAX build lowers f32 matmuls at bf16 precision by default (TPU MXU
# convention); the Gibbs recursion needs true f32 accumulation.
_PREC = jax.lax.Precision.HIGHEST

from gmrm_tpu.ops.decode import decode_planes_jax


def _xc(bed_block, mave, dtype):
    """Decode a marker block and center: xc = a - mave*b, phase layout.

    bed_block: (B, mb) uint8; mave: (T, B) -> returns (T, B, 4, mb).
    """
    a, b = decode_planes_jax(bed_block, dtype=dtype)       # (B, 4, mb)
    return a[None] - mave[:, :, None, None] * b[None]      # (T, B, 4, mb)


def block_gram(bed_block, eps, na, mave, *, dtype=jnp.float32):
    """Raw dot products and Gram matrix for one marker block.

    Args:
      bed_block: (B, mb) uint8 packed genotypes.
      eps: (T, 4, mb) residual phase planes (zeros at NAs and padding).
      na:  (T, 4, mb) 0/1 phenotype-observed masks.
      mave: (T, B) per-trait marker means for the block.

    Returns:
      craw: (T, B) = sum_i xc[t,j,i] * eps[t,i]   (the un-scaled x^T eps;
            the NA mask is implicit because eps is 0 there — matching the
            reference dot product which also omits it, bayes.cpp:709-770).
      graw: (T, B, B) = sum_i na[t,i] * xc[t,j,i] * xc[t,j',i].
    """
    xc = _xc(bed_block, mave, dtype)                       # (T, B, 4, mb)
    craw = jnp.einsum("tbkm,tkm->tb", xc, eps,
                      preferred_element_type=dtype, precision=_PREC)
    xcn = xc * na[:, None, :, :]
    graw = jnp.einsum("tbkm,tckm->tbc", xcn, xc,
                      preferred_element_type=dtype, precision=_PREC)
    return craw, graw


def block_eps_update(bed_block, dbeta_scaled, na, mave, *, dtype=jnp.float32):
    """Residual delta from a block's accepted moves.

    dbeta_scaled: (T, B) = msig * (beta_old - beta_new) per marker.
    Returns deps (T, 4, mb) = na * sum_j dbeta_scaled[t,j] * xc[t,j],
    the batched form of the reference rank-1 update
    ``eps += dbeta*msig*(a - mave*b)*na`` (phenotype.cpp:326-393).
    """
    xc = _xc(bed_block, mave, dtype)                       # (T, B, 4, mb)
    deps = jnp.einsum("tb,tbkm->tkm", dbeta_scaled, xc,
                      preferred_element_type=dtype, precision=_PREC)
    return deps * na


def marker_stats_jax(bed, na, nonas, *, dtype=jnp.float32, chunk=512):
    """Per-marker mean and inverse-sd for all traits, fused single pass.

    bed: (M, mb) uint8; na: (T, 4, mb); nonas: (T,).
    Returns (mave, msig) each (T, M):
      mave = sum(a*na)/sum(b*na)
      msig = 1/sqrt((sum(a^2*na) - 2*mave*sum(a*na) + mave^2*sum(b*na))
                    / (nonas-1))
    which equals the reference two-pass formula (phenotype.cpp:466-556)
    because a*b == a and b*b == b for this decode.
    """
    m = bed.shape[0]
    n_chunks = -(-m // chunk)
    m_pad = n_chunks * chunk
    if m_pad != m:
        pad = jnp.full((m_pad - m, bed.shape[1]), 0x55, dtype=jnp.uint8)
        bed = jnp.concatenate([bed, pad], axis=0)
    bed_c = bed.reshape(n_chunks, chunk, -1)

    def one_chunk(bc):
        a, b = decode_planes_jax(bc, dtype=dtype)          # (chunk, 4, mb)
        sa = jnp.einsum("bkm,tkm->tb", a, na, preferred_element_type=dtype, precision=_PREC)
        sb = jnp.einsum("bkm,tkm->tb", b, na, preferred_element_type=dtype, precision=_PREC)
        saa = jnp.einsum("bkm,tkm->tb", a * a, na, preferred_element_type=dtype, precision=_PREC)
        return sa, sb, saa

    sa, sb, saa = jax.lax.map(one_chunk, bed_c)            # (n_chunks, T, chunk)
    sa = jnp.moveaxis(sa, 1, 0).reshape(na.shape[0], m_pad)[:, :m]
    sb = jnp.moveaxis(sb, 1, 0).reshape(na.shape[0], m_pad)[:, :m]
    saa = jnp.moveaxis(saa, 1, 0).reshape(na.shape[0], m_pad)[:, :m]

    mave = sa / sb
    ssq = saa - 2.0 * mave * sa + mave * mave * sb
    msig = 1.0 / jnp.sqrt(ssq / (nonas[:, None].astype(dtype) - 1.0))
    return mave, msig
