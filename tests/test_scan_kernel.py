"""The Pallas within-block scan kernel vs the XLA block_scan reference.

Runs the kernel in interpret mode so the TPU code path is exercised by the
CPU test suite.  Component choices must match exactly; continuous outputs
to float32 tolerance (the kernel uses reciprocal-multiply where block_scan
divides).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gmrm_tpu.ops import scan_kernel, scan_kernel_spec
from gmrm_tpu.sampler.scan import block_scan

KERNELS = {
    "v1": scan_kernel.block_scan_pallas,
    "spec": scan_kernel_spec.block_scan_pallas,
}


def _random_case(rng, T, B, G, K, *, adav_group=None, overflow=False):
    c = rng.normal(size=(T, B)) * (200.0 if overflow else 5.0)
    gs = rng.normal(size=(T, B, B)) * 0.02
    beta_old = rng.normal(size=(T, B)) * 0.01
    comp_old = rng.integers(0, K, size=(T, B))
    acum_old = rng.uniform(size=(T, B))
    grp = rng.integers(0, G, size=B)
    valid = rng.uniform(size=B) > 0.1
    u = rng.uniform(size=(T, B))
    z = rng.normal(size=(T, B))
    sigmag = rng.uniform(0.05, 0.5, size=(T, G))
    if adav_group is not None:
        sigmag[:, adav_group] = 0.0
    sigmae = rng.uniform(0.3, 0.9, size=T)
    pi = rng.dirichlet(np.ones(K), size=(T, G))
    cva = np.sort(rng.uniform(1e-5, 1e-2, size=(G, K)), axis=1)
    cva[:, 0] = 0.0
    cvai = np.zeros_like(cva)
    cvai[:, 1:] = 1.0 / cva[:, 1:]
    nonas = np.full(T, 9900.0)
    n_total = 10000.0
    f32 = jnp.float32
    args = (
        jnp.asarray(c, f32), jnp.asarray(gs, f32),
        jnp.asarray(beta_old, f32), jnp.asarray(comp_old, jnp.int32),
        jnp.asarray(acum_old, f32), jnp.asarray(grp, jnp.int32),
        jnp.asarray(valid), jnp.asarray(u, f32), jnp.asarray(z, f32),
        jnp.asarray(sigmag, f32), jnp.asarray(sigmae, f32),
        jnp.asarray(pi, f32), jnp.asarray(cva, f32), jnp.asarray(cvai, f32),
        jnp.asarray(nonas, f32), jnp.asarray(n_total, f32),
    )
    return args


@pytest.mark.parametrize("kernel", sorted(KERNELS))
@pytest.mark.parametrize("case", ["plain", "adav", "overflow"])
def test_pallas_scan_matches_block_scan(case, kernel):
    rng = np.random.default_rng({"plain": 0, "adav": 1, "overflow": 2}[case])
    T, B, G, K = 3, 32, 2, 4
    args = _random_case(
        rng, T, B, G, K,
        adav_group=0 if case == "adav" else None,
        overflow=case == "overflow",
    )
    ref = block_scan(*args)
    out = KERNELS[kernel](*args, interpret=True)

    np.testing.assert_array_equal(
        np.asarray(out.comp_new), np.asarray(ref.comp_new),
        err_msg=f"{case}: component choices diverged",
    )
    np.testing.assert_array_equal(np.asarray(out.cass_inc),
                                  np.asarray(ref.cass_inc))
    np.testing.assert_allclose(np.asarray(out.beta_new),
                               np.asarray(ref.beta_new),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.dbeta_eff),
                               np.asarray(ref.dbeta_eff),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.acum_new),
                               np.asarray(ref.acum_new),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("kernel", sorted(KERNELS))
def test_pallas_scan_serial_dependency(kernel):
    """The Gram correction must propagate: a strong first marker changes
    the draw of a correlated later marker (exactness of the recursion is
    covered by the oracle tests; this guards the corr buffer wiring)."""
    block_scan_pallas = KERNELS[kernel]
    rng = np.random.default_rng(7)
    T, B, G, K = 1, 8, 1, 4
    args = list(_random_case(rng, T, B, G, K))
    # Make marker 0 strongly selected and correlated with marker 5.
    c = np.zeros((T, B)); c[0, 0] = 400.0; c[0, 5] = 30.0
    gs = np.zeros((T, B, B)); gs[0, 0, 5] = gs[0, 5, 0] = 500.0
    args[0] = jnp.asarray(c, jnp.float32)
    args[1] = jnp.asarray(gs, jnp.float32)
    args[6] = jnp.ones(B, bool)
    out = block_scan_pallas(*args, interpret=True)
    ref = block_scan(*args)
    np.testing.assert_array_equal(np.asarray(out.comp_new),
                                  np.asarray(ref.comp_new))
    np.testing.assert_allclose(np.asarray(out.beta_new),
                               np.asarray(ref.beta_new), rtol=1e-5,
                               atol=1e-6)
    # And the later marker's beta is genuinely affected by the earlier one.
    args2 = list(args)
    gs0 = np.zeros((T, B, B))
    args2[1] = jnp.asarray(gs0, jnp.float32)
    out2 = block_scan_pallas(*args2, interpret=True)
    assert not np.allclose(np.asarray(out.beta_new)[0, 5],
                           np.asarray(out2.beta_new)[0, 5])
