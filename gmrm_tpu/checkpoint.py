"""Chain checkpoint/resume.

The reference cannot resume an MCMC chain — its only persisted state is the
thinned .bet/.cpn/.csv history (SURVEY §5, reference bayes.cpp:659-669).
This module adds true checkpointing: the full sampler state pytree plus the
iteration counter and posterior-mean accumulator, as a single .npz.  The
RNG needs no state — keys are derived from (seed, iteration), so a resumed
chain is bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gmrm_tpu.sampler.state import SamplerState

_FIELDS = ("eps", "betas", "comp", "acum", "cass", "sigmag", "sigmae",
           "pi_est", "mu", "epssum", "key")


def checkpoint_path(out_dir: str) -> str:
    return os.path.join(out_dir, "checkpoint.npz")


def _ckpt_files(out_dir: str) -> list:
    """All checkpoint files in out_dir (current + *.prev fallbacks, any
    process layout); the sharded loader groups them into save eras by
    iteration and uses the newest COMPLETE one."""
    import glob
    files = sorted(glob.glob(os.path.join(out_dir, "checkpoint*.npz")))
    return [f for f in files if not f.endswith(".tmp.npz")]


def _clear_ckpt_files(out_dir: str) -> None:
    """A fresh (non-resume) run must not leave stale checkpoint files
    behind: a later --resume would otherwise merge state from a DEAD
    chain that happens to share an iteration number with the new one."""
    for f in _ckpt_files(out_dir):
        os.remove(f)


_LAYOUT_KEYS = ("block_size", "wave_size", "interleave", "m_total")


def layout_of(opt, m_total: int = 0) -> dict:
    """The marker-STORAGE layout a run's state arrays are laid out in.

    ``interleave`` (on whenever wave mode is active) reorders
    betas/comp/acum rows via runner.interleave_order, whose permutation
    depends on nblocks = m_pad // block_size AND on the marker count —
    a changed --trunc-markers can keep every padded shape while
    producing a different permutation (code-review r5) — so state saved
    under one (block_size, interleave, m_total) silently misaligns
    against a run resolved with another.  Stamped into every
    checkpoint; load fails loudly on mismatch instead of continuing a
    corrupted chain."""
    opt.resolve_compute_plan()
    return {"block_size": int(opt.block_size),
            "wave_size": int(opt.wave_size or 1),
            "interleave": int((opt.wave_size or 1) > 1),
            "m_total": int(m_total)}


def check_layout(path: str, z, expect: Optional[dict]) -> None:
    if expect is None:
        return
    if "layout_block_size" not in getattr(z, "files", z):
        # Unstamped = written before layout stamping, when the storage
        # order (original vs block-interleaved) was NOT recorded — it
        # cannot be verified, and resuming misaligned state corrupts
        # the chain silently.  Refuse outright rather than guess.
        raise ValueError(
            f"{path}: checkpoint predates layout stamping — its marker "
            f"storage order cannot be verified against this run's.  "
            f"Restart the chain (or re-save the checkpoint with a "
            f"stamped build of the exact configuration that wrote it).")
    # Compare only the keys the checkpoint carries: stamps written
    # before m_total was added lack layout_m_total (the sharded loader
    # tolerates the same gap) — a KeyError here would make every such
    # checkpoint unresumable with an opaque error.
    keys = [k for k in _LAYOUT_KEYS if f"layout_{k}" in z.files]
    got = {k: int(z[f"layout_{k}"]) for k in keys}
    want = {k: expect[k] for k in keys}
    if got != want:
        hint = ("changed --trunc-markers / dataset?"
                if got.get("m_total") != want.get("m_total")
                else "pass matching --block-size/--wave-size")
        raise ValueError(
            f"{path}: checkpoint marker-storage layout {got} does not "
            f"match the current run's {want}; resuming would misalign "
            f"betas/comp/acum against the re-ordered genotype matrix "
            f"({hint}).")


def save_checkpoint(path: str, state: SamplerState, it: int,
                    beta_acc: Optional[np.ndarray], n_rec: int,
                    layout: Optional[dict] = None) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    arrays["it"] = np.asarray(it)
    arrays["n_rec"] = np.asarray(n_rec)
    if beta_acc is not None:
        arrays["beta_acc"] = beta_acc
    if layout is not None:
        for k in _LAYOUT_KEYS:
            arrays[f"layout_{k}"] = np.asarray(layout[k])
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, dtype=jnp.float32,
                    expect_layout: Optional[dict] = None,
                    ) -> Tuple[SamplerState, int, Optional[np.ndarray], int]:
    with np.load(path) as z:
        if "starts" in z.files:
            raise ValueError(
                f"{path}: this is a topology-portable SHARDED checkpoint "
                f"(v2, written by parallel.runner.run_training_sharded) "
                f"— resume it with the sharded runner (any device/"
                f"process count), not the single-device runner.")
        check_layout(path, z, expect_layout)
        kw = {}
        for f in _FIELDS:
            arr = z[f]
            if f in ("comp", "cass"):
                kw[f] = jnp.asarray(arr, jnp.int32)
            elif f == "key":
                kw[f] = jnp.asarray(arr)
            else:
                kw[f] = jnp.asarray(arr, dtype)
        state = SamplerState(**kw)
        it = int(z["it"])
        n_rec = int(z["n_rec"])
        beta_acc = z["beta_acc"] if "beta_acc" in z.files else None
    return state, it, beta_acc, n_rec
