"""Distribution samplers on jax.random keys.

Counter-based replacements for the reference's boost::mt19937 wrappers
(``src/distributions.hpp:24-59``).  Bit-exactness across RNG families is
impossible; the equivalence target is distributional (same laws), verified
statistically in tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.random as jr


def inv_scaled_chisq(key, a, b, dtype=jnp.float32):
    """Scaled inverse chi-squared draw.

    Reference (distributions.hpp:24-30): inv_scaled_chisq(a,b) =
    inv_gamma(a/2, a*b/2) = (a*b/2) / Gamma(a/2, scale=1).
    Broadcasts over a/b.
    """
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    g = jr.gamma(key, 0.5 * a, dtype=dtype)
    return (0.5 * a * b) / g


def dirichlet_from_counts(key, alpha, dtype=jnp.float32):
    """Dirichlet(alpha) via normalized gammas, as the reference does with
    per-component rgamma(cass+1, 1) (phenotype.cpp:227-237)."""
    g = jr.gamma(key, jnp.asarray(alpha, dtype), dtype=dtype)
    return g / jnp.sum(g, axis=-1, keepdims=True)


def beta_11(key, shape, dtype=jnp.float32):
    """Beta(1,1) == Uniform(0,1): the reference's sigmaG initialization draw
    (bayes.cpp:327)."""
    return jr.uniform(key, shape, dtype=dtype)
