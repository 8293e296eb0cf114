"""Pallas TPU kernels for the block Gram / residual-update path.

Status: delegation stubs.  The XLA path in gmrm_tpu.ops.blockops is
correct and MXU-bound already (decode fuses into the einsums); the Pallas
variants exist so large-N runs can stream the packed bed block through VMEM
tiles without materializing the decoded (B, N) matrix in HBM.  They will
replace the delegates below; callers select via use_pallas and both paths
are cross-tested.
"""

from __future__ import annotations

import jax.numpy as jnp

from gmrm_tpu.ops.blockops import block_gram, block_eps_update

HAVE_PALLAS_KERNELS = False


def block_gram_pallas(bed_block, eps, na, mave, *, dtype=jnp.float32,
                      shared_na=False):
    return block_gram(bed_block, eps, na, mave, dtype=dtype,
                      shared_na=shared_na)


def block_eps_update_pallas(bed_block, dbeta_scaled, na, mave, *,
                            dtype=jnp.float32):
    return block_eps_update(bed_block, dbeta_scaled, na, mave, dtype=dtype)
