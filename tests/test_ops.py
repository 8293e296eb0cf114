"""Decode / stats / block-op kernels vs. the NumPy oracle."""

import jax.numpy as jnp
import numpy as np

from gmrm_tpu.io.bed import (
    read_bed, unpack_codes, decode_planes, bed_bytes_per_marker, MISSING_BYTE,
)
from gmrm_tpu.io.grouping import read_dim
from gmrm_tpu.io.phen import read_phen
from gmrm_tpu.ops.blockops import block_gram, block_eps_update, marker_stats_jax
from gmrm_tpu.ops.decode import (
    decode_planes_jax, to_phase_planes, from_phase_planes,
)
from gmrm_tpu import oracle


def _load(sim, trait=0, padded=False):
    n, m = read_dim(sim.dim)
    bed = read_bed(sim.bed, n, m)
    ph = read_phen(sim.phens[trait], n)
    codes = unpack_codes(bed, n if not padded else 4 * bed.shape[1])
    a, b = decode_planes(codes)
    if padded:
        # Kill the PLINK byte-padding tail like the reference's mask does.
        napad = ph.na_vector_padded()
        a, b = a * napad, b * napad
    return n, m, bed, ph, a, b


def test_decode_jax_matches_numpy(sim_small):
    n, m, bed, ph, a_np, b_np = _load(sim_small)
    a_j, b_j = decode_planes_jax(jnp.asarray(bed))
    # Phase planes -> standard order -> compare over the first N entries.
    a_std = from_phase_planes(np.asarray(a_j))[:, :n]
    b_std = from_phase_planes(np.asarray(b_j))[:, :n]
    np.testing.assert_array_equal(a_std, a_np)
    np.testing.assert_array_equal(b_std, b_np)


def test_missing_byte_decodes_to_zero():
    a, b = decode_planes_jax(jnp.full((1, 3), MISSING_BYTE, jnp.uint8))
    assert float(jnp.abs(a).sum()) == 0.0
    assert float(jnp.abs(b).sum()) == 0.0


def test_phase_roundtrip(rng):
    v = rng.normal(size=(3, 16))
    p = to_phase_planes(v)
    assert p.shape == (3, 4, 4)
    np.testing.assert_array_equal(from_phase_planes(p), v)
    # Plane k holds individuals k, 4+k, ...
    np.testing.assert_array_equal(p[:, 1, 0], v[:, 1])
    np.testing.assert_array_equal(p[:, 2, 3], v[:, 14])


def test_marker_stats(sim_small):
    n, m, bed, ph, a, b = _load(sim_small)
    na_std = ph.na_vector_padded()[:a.shape[1]]
    mave_o, msig_o = oracle.marker_stats(a, b, na_std, ph.nonas)

    na = to_phase_planes(ph.na_vector_padded())[None]
    mave_j, msig_j = marker_stats_jax(
        jnp.asarray(bed), jnp.asarray(na, jnp.float32),
        jnp.asarray([ph.nonas], jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(mave_j)[0], mave_o, rtol=2e-6)
    np.testing.assert_allclose(np.asarray(msig_j)[0], msig_o, rtol=2e-5)


def test_block_gram_and_update(sim_small, rng):
    n, m, bed, ph, a, b = _load(sim_small, padded=True)
    npad = a.shape[1]
    na_std = ph.na_vector_padded()
    mave, msig = oracle.marker_stats(a, b, na_std, ph.nonas)

    eps_std = rng.normal(size=npad) * na_std     # residual is 0 at NAs
    B = 16
    idx = rng.choice(m, size=B, replace=False)

    # Oracle quantities.
    xc = (a[idx] - mave[idx][:, None] * b[idx])              # (B, Np)
    craw_o = xc @ eps_std
    graw_o = (xc * na_std) @ xc.T
    dbeta = rng.normal(size=B)
    deps_o = (dbeta * msig[idx]) @ xc * na_std

    eps_p = jnp.asarray(to_phase_planes(eps_std)[None], jnp.float32)
    na_p = jnp.asarray(to_phase_planes(na_std)[None], jnp.float32)
    mave_blk = jnp.asarray(mave[idx][None], jnp.float32)
    bed_blk = jnp.asarray(bed[idx])

    craw_j, graw_j = block_gram(bed_blk, eps_p, na_p, mave_blk)
    np.testing.assert_allclose(np.asarray(craw_j)[0], craw_o, rtol=3e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(graw_j)[0], graw_o, rtol=3e-5,
                               atol=1e-3)

    dbs = jnp.asarray((dbeta * msig[idx])[None], jnp.float32)
    deps_j = block_eps_update(bed_blk, dbs, na_p, mave_blk)
    deps_std = from_phase_planes(np.asarray(deps_j))[0]
    # The continuous dbeta operand rides a bf16 hi+lo split (blockops),
    # bounding the relative error at ~2^-17.
    np.testing.assert_allclose(deps_std, deps_o, rtol=5e-4, atol=5e-5)

    # shared_na must be bit-compatible with the general path when every
    # trait's mask is the same (it is: one trait here).
    craw_s, graw_s = block_gram(bed_blk, eps_p, na_p, mave_blk,
                                shared_na=True)
    np.testing.assert_allclose(np.asarray(craw_s), np.asarray(craw_j),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(graw_s), np.asarray(graw_j),
                               rtol=1e-6, atol=1e-5)
