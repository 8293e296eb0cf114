"""Fused Pallas Gram/update kernels vs the XLA blockops path.

Runs in interpret mode on CPU (conftest pins the test backend to CPU); the
same kernels are A/B-checked on the real device by the bench harness
(benchmarking/PROFILE.md) and exercised by bench.py.

The fused kernels use the same exact-bf16 strategy as the XLA f32 path
(integer-plane matmuls exact; eps Dekker-split hi+lo), so agreement with
blockops is tight; both are also compared against the float64 wide path
with the bf16-split tolerance (~2^-17 relative).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gmrm_tpu.ops.blockops import block_gram, block_eps_update
from gmrm_tpu.ops.pallas_kernels import (
    HAVE_PALLAS_KERNELS,
    block_gram_scaled_pallas,
    block_eps_update_pallas,
)
from gmrm_tpu.ops.decode import decode_planes_jax


def _case(rng, T, B, mb, *, with_nas):
    bed = rng.integers(0, 256, size=(B, mb), dtype=np.uint8)
    na = np.ones((T, 4, mb), np.float32)
    if with_nas:
        na *= (rng.uniform(size=(T, 4, mb)) > 0.03)
    eps = rng.normal(size=(T, 4, mb)).astype(np.float32) * na
    # realistic mave/msig ranges
    mave = rng.uniform(0.2, 1.8, size=(T, B)).astype(np.float32)
    msig = rng.uniform(0.5, 2.0, size=(T, B)).astype(np.float32)
    return (jnp.asarray(bed), jnp.asarray(eps), jnp.asarray(na),
            jnp.asarray(mave), jnp.asarray(msig))


# mb values: < one lane tile with ragged tail, multi-tile with ragged tail,
# and exactly tile-aligned.
@pytest.mark.parametrize("mb", [300, 700, 512])
@pytest.mark.parametrize("shared_na", [True, False])
def test_gram_kernel_matches_blockops(mb, shared_na):
    assert HAVE_PALLAS_KERNELS
    rng = np.random.default_rng(mb + int(shared_na))
    T, B = 3, 32
    bed, eps, na, mave, msig = _case(rng, T, B, mb, with_nas=not shared_na)

    c_k, gs_k = block_gram_scaled_pallas(
        bed, eps, na, mave, msig, shared_na=shared_na, interpret=True)

    craw, graw = block_gram(bed, eps, na, mave, dtype=jnp.float32,
                            shared_na=shared_na)
    c_x = msig * craw
    gs_x = msig[:, :, None] * msig[:, None, :] * graw

    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_x),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gs_k), np.asarray(gs_x),
                               rtol=2e-5, atol=2e-3)

    # and against the float64 oracle-grade path (bf16-split tolerance)
    craw64, graw64 = block_gram(bed, eps.astype(jnp.float64),
                                na.astype(jnp.float64),
                                mave.astype(jnp.float64),
                                dtype=jnp.float64, shared_na=shared_na)
    c64 = np.asarray(msig, np.float64) * np.asarray(craw64)
    scale = np.abs(np.asarray(craw64)).max() + 1.0
    np.testing.assert_allclose(np.asarray(c_k) / scale, c64 / scale,
                               rtol=0, atol=3e-5)


@pytest.mark.parametrize("mb", [300, 700])
def test_eps_update_kernel_matches_blockops(mb):
    rng = np.random.default_rng(mb)
    T, B = 3, 32
    bed, eps, na, mave, msig = _case(rng, T, B, mb, with_nas=True)
    dbeta = (rng.normal(size=(T, B)) *
             (rng.uniform(size=(T, B)) > 0.5)).astype(np.float32)
    dbeta = jnp.asarray(dbeta)

    deps_k = block_eps_update_pallas(bed, dbeta, na, mave, interpret=True)
    deps_x = block_eps_update(bed, dbeta, na, mave, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(deps_k), np.asarray(deps_x),
                               rtol=2e-5, atol=2e-4)

    # float64 ground truth via explicit decode
    a, b = decode_planes_jax(bed, dtype=jnp.float64)
    xc = (np.asarray(a)[None] -
          np.asarray(mave, np.float64)[:, :, None, None] * np.asarray(b)[None])
    want = np.einsum("tb,tbkm->tkm", np.asarray(dbeta, np.float64), xc)
    want *= np.asarray(na, np.float64)
    scale = np.abs(want).max() + 1.0
    np.testing.assert_allclose(np.asarray(deps_k) / scale, want / scale,
                               rtol=0, atol=3e-5)


def test_gram_kernel_wide_dtype_fallback():
    """dtype=float64 must route to the XLA wide path bit-for-bit."""
    rng = np.random.default_rng(0)
    T, B, mb = 2, 8, 64
    bed, eps, na, mave, msig = _case(rng, T, B, mb, with_nas=True)
    eps64 = eps.astype(jnp.float64)
    na64 = na.astype(jnp.float64)
    mave64 = mave.astype(jnp.float64)
    msig64 = msig.astype(jnp.float64)
    c_k, gs_k = block_gram_scaled_pallas(
        bed, eps64, na64, mave64, msig64, dtype=jnp.float64)
    craw, graw = block_gram(bed, eps64, na64, mave64, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(c_k), np.asarray(msig64 * craw))
    np.testing.assert_array_equal(
        np.asarray(gs_k),
        np.asarray(msig64[:, :, None] * msig64[:, None, :] * graw))
