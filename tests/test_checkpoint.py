"""Checkpoint/resume: a resumed chain must be bit-identical to an
uninterrupted one (keys derive from (seed, iteration), so no RNG state
needs persisting)."""

import os

import numpy as np

from gmrm_tpu.config import Options
from gmrm_tpu.io.writers import read_history
from gmrm_tpu.runner import run_training


def _opts(sim, out_dir, iterations, **kw):
    base = dict(
        bed_file=sim.bed, dim_file=sim.dim, phen_files=[sim.phens[0]],
        group_index_file=sim.gri, group_mixture_file=sim.grm,
        iterations=iterations, seed=7, out_dir=out_dir, block_size=16,
        output_thin_rate=2,
    )
    base.update(kw)
    return Options(**base)


def test_resume_bit_identical(sim_small, tmp_path):
    full_dir = str(tmp_path / "full")
    res_full = run_training(_opts(sim_small, full_dir, 12), verbose=False)

    part_dir = str(tmp_path / "part")
    run_training(_opts(sim_small, part_dir, 6, checkpoint_every=3),
                 verbose=False)
    assert os.path.exists(os.path.join(part_dir, "checkpoint.npz"))
    res_resumed = run_training(
        _opts(sim_small, part_dir, 12, checkpoint_every=3, resume=True),
        verbose=False)

    np.testing.assert_array_equal(
        np.asarray(res_full.state.betas), np.asarray(res_resumed.state.betas))
    np.testing.assert_array_equal(
        np.asarray(res_full.state.sigmag),
        np.asarray(res_resumed.state.sigmag))
    np.testing.assert_array_equal(
        np.asarray(res_full.state.eps), np.asarray(res_resumed.state.eps))

    # The .bet history must contain all 6 thinned records, matching the
    # uninterrupted run byte-for-byte.
    i_full, d_full = read_history(os.path.join(full_dir, "test1.bet"), "f8")
    i_res, d_res = read_history(os.path.join(part_dir, "test1.bet"), "f8")
    np.testing.assert_array_equal(i_full, i_res)
    np.testing.assert_array_equal(d_full, d_res)


def test_resume_without_checkpoint_starts_fresh(sim_small, tmp_path):
    out = str(tmp_path / "fresh")
    res = run_training(_opts(sim_small, out, 4, resume=True), verbose=False)
    assert len(res.iter_seconds) == 4


def test_sharded_resume_truncates_stale_rows(sim_small, tmp_path):
    """Resuming a SHARDED run from a checkpoint OLDER than the output
    files must truncate rows past the checkpoint (VERDICT r3 weak 6):
    final artifacts match an uninterrupted run byte-for-byte."""
    import jax
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gmrm_tpu.parallel.runner import run_training_sharded

    full_dir = str(tmp_path / "sfull")
    run_training_sharded(_opts(sim_small, full_dir, 10), verbose=False)

    # Crash scenario: the chain ran to 14 (rows for it=10..14 on disk)
    # but the last checkpoint is from it=8; the resumed 10-iteration run
    # must drop the stale tail before re-writing.
    part_dir = str(tmp_path / "spart")
    run_training_sharded(_opts(sim_small, part_dir, 14, checkpoint_every=8),
                         verbose=False)
    run_training_sharded(
        _opts(sim_small, part_dir, 10, checkpoint_every=8, resume=True),
        verbose=False)

    for suf in (".bet", ".cpn", ".csv"):
        a = open(os.path.join(full_dir, "test1" + suf), "rb").read()
        b = open(os.path.join(part_dir, "test1" + suf), "rb").read()
        assert a == b, f"{suf}: resumed artifact differs / stale rows"


def test_resume_bit_identical_wave_mode(sim_small, tmp_path):
    """Resume under the production wave mode: interleaved marker storage
    (runner.interleave_order) must reproduce identically across the
    checkpoint boundary — artifacts byte-identical to an uninterrupted
    run."""
    kw = dict(use_pallas=True, wave_size=4, block_size=16)
    full_dir = str(tmp_path / "wfull")
    run_training(_opts(sim_small, full_dir, 12, **kw), verbose=False)

    part_dir = str(tmp_path / "wpart")
    run_training(_opts(sim_small, part_dir, 6, checkpoint_every=3, **kw),
                 verbose=False)
    run_training(
        _opts(sim_small, part_dir, 12, checkpoint_every=3, resume=True,
              **kw),
        verbose=False)

    for suf in (".bet", ".cpn", ".csv"):
        a = open(os.path.join(full_dir, "test1" + suf), "rb").read()
        b = open(os.path.join(part_dir, "test1" + suf), "rb").read()
        assert a == b, f"{suf}: wave-mode resume differs"
