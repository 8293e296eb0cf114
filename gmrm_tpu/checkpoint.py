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


def save_checkpoint(path: str, state: SamplerState, it: int,
                    beta_acc: Optional[np.ndarray], n_rec: int) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    arrays["it"] = np.asarray(it)
    arrays["n_rec"] = np.asarray(n_rec)
    if beta_acc is not None:
        arrays["beta_acc"] = beta_acc
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, dtype=jnp.float32
                    ) -> Tuple[SamplerState, int, Optional[np.ndarray], int]:
    with np.load(path) as z:
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
