"""Whole-sweep mega-kernel vs the composed per-block path.

Both run the SAME wave relaxation; outputs must agree: component choices
exactly, continuous state to f32 tolerance.  Interpret mode on CPU (the
conftest pins the backend); the real-device path is exercised by the
bench harness.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gmrm_tpu.ops.pallas_kernels as pk
import gmrm_tpu.ops.scan_kernel_wave as skw
import gmrm_tpu.ops.sweep_kernel as swk
from gmrm_tpu.config import Options
from gmrm_tpu.io.sim import simulate
from gmrm_tpu.runner import load_data, build_static, init_sampler_state
from gmrm_tpu.sampler.gibbs import gibbs_iteration


@pytest.fixture(scope="module")
def small_setup(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("megadata"))
    sim = simulate(out, n=600, m=128, n_traits=2, n_causal=32, h2=0.5,
                   n_groups=2, na_rate=0.02, seed=7)
    opt = Options(bed_file=sim.bed, dim_file=sim.dim, phen_files=sim.phens,
                  group_index_file=sim.gri, group_mixture_file=sim.grm,
                  iterations=1, seed=3, block_size=32, wave_size=8,
                  use_pallas=True, output_thin_rate=10 ** 9)
    opt.validate()
    opt.load_group_mixtures()
    data = load_data(opt)
    static = build_static(data, opt, jnp.float32)
    state = init_sampler_state(data, opt, jnp.float32)
    return opt, data, static, state


@pytest.mark.parametrize("wave", [8, 32])
def test_megakernel_matches_composed_path(small_setup, wave, monkeypatch):
    monkeypatch.setattr(pk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(skw, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "FORCE_INTERPRET", True)
    opt, data, static, state = small_setup
    shared_na = all(ph.nas == 0 for ph in data.phens)

    outs = {}
    for name, mega in (("composed", False), ("mega", True)):
        s2, aux = gibbs_iteration(
            state, static, jnp.asarray(3, jnp.int32),
            block_size=opt.block_size, use_pallas=True,
            shared_na=shared_na, wave_size=wave, megakernel=mega)
        outs[name] = jax.device_get((s2, aux))

    a, b = outs["composed"][0], outs["mega"][0]
    np.testing.assert_array_equal(np.asarray(b.comp), np.asarray(a.comp))
    np.testing.assert_array_equal(np.asarray(b.cass), np.asarray(a.cass))
    np.testing.assert_allclose(np.asarray(b.betas), np.asarray(a.betas),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.eps), np.asarray(a.eps),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(b.sigmae), np.asarray(a.sigmae),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(b.acum), np.asarray(a.acum),
                               rtol=1e-3, atol=1e-5)


def test_megakernel_multi_iteration_chain(small_setup, monkeypatch):
    """Three chained iterations stay in agreement (eps feedback loop)."""
    monkeypatch.setattr(pk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(skw, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "FORCE_INTERPRET", True)
    opt, data, static, state = small_setup
    shared_na = all(ph.nas == 0 for ph in data.phens)

    s_a = s_b = state
    for it in range(1, 4):
        s_a, _ = gibbs_iteration(
            s_a, static, jnp.asarray(it, jnp.int32),
            block_size=opt.block_size, use_pallas=True,
            shared_na=shared_na, wave_size=8, megakernel=False)
        s_b, _ = gibbs_iteration(
            s_b, static, jnp.asarray(it, jnp.int32),
            block_size=opt.block_size, use_pallas=True,
            shared_na=shared_na, wave_size=8, megakernel=True)
    s_a, s_b = jax.device_get((s_a, s_b))
    np.testing.assert_array_equal(np.asarray(s_b.comp), np.asarray(s_a.comp))
    np.testing.assert_allclose(np.asarray(s_b.betas), np.asarray(s_a.betas),
                               rtol=1e-3, atol=1e-4)


def test_cached_gram_matches_recompute(small_setup, monkeypatch):
    """The cached-Gram composed path (gram from build_gram_cache,
    permuted+scaled in XLA) must agree with the full-recompute composed
    path: identical processing order, identical math restructuring —
    components exactly, continuous state to f32 tolerance."""
    monkeypatch.setattr(pk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(skw, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "FORCE_INTERPRET", True)
    opt, data, static, state = small_setup
    shared_na = all(ph.nas == 0 for ph in data.phens)
    assert static.gram_cache is not None

    outs = {}
    for name, cached in (("recompute", False), ("cached", True)):
        s2, _ = gibbs_iteration(
            state, static, jnp.asarray(5, jnp.int32),
            block_size=opt.block_size, use_pallas=True,
            shared_na=shared_na, wave_size=8, megakernel=False,
            gram_cached=cached)
        outs[name] = jax.device_get(s2)

    a, b = outs["recompute"], outs["cached"]
    np.testing.assert_array_equal(np.asarray(b.comp), np.asarray(a.comp))
    np.testing.assert_array_equal(np.asarray(b.cass), np.asarray(a.cass))
    np.testing.assert_allclose(np.asarray(b.betas), np.asarray(a.betas),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.eps), np.asarray(a.eps),
                               rtol=1e-4, atol=1e-5)


def test_megakernel_raises_without_prerequisites(small_setup):
    """megakernel=True with missing prerequisites must fail loudly, not
    silently fall back to the composed path (ADVICE r3)."""
    opt, data, static, state = small_setup
    with pytest.raises(ValueError, match="megakernel=True requires"):
        gibbs_iteration(
            state, static, jnp.asarray(1, jnp.int32),
            block_size=opt.block_size, use_pallas=True,
            wave_size=1, megakernel=True)


@pytest.fixture(scope="module")
def tall_setup(tmp_path_factory):
    """Enough individuals for a multi-lane-tile bed row (mb_pad = 1024)."""
    out = str(tmp_path_factory.mktemp("talldata"))
    sim = simulate(out, n=2500, m=64, n_traits=2, n_causal=16, h2=0.5,
                   n_groups=1, na_rate=0.0, seed=11)
    opt = Options(bed_file=sim.bed, dim_file=sim.dim, phen_files=sim.phens,
                  group_index_file=sim.gri, group_mixture_file=sim.grm,
                  iterations=1, seed=5, block_size=32, wave_size=8,
                  use_pallas=True, output_thin_rate=10 ** 9)
    opt.validate()
    opt.load_group_mixtures()
    data = load_data(opt)
    static = build_static(data, opt, jnp.float32)
    state = init_sampler_state(data, opt, jnp.float32)
    return opt, data, static, state


def test_tiled_megakernel_matches_composed(tall_setup, monkeypatch):
    """The N-tiled mega-kernel (grid (nblocks, 2, n_tiles) — the UKB-scale
    variant, VERDICT r3 item 2) vs the composed path, with TILE_MAX_LANES
    shrunk so the grid really has 2 lane tiles."""
    monkeypatch.setattr(pk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(skw, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "TILE_MAX_LANES", 1)
    opt, data, static, state = tall_setup
    assert static.bed.shape[1] == 1024     # 2 tiles at TILE_MAX_LANES=1
    shared_na = all(ph.nas == 0 for ph in data.phens)

    outs = {}
    for name, mega in (("composed", False), ("tiled", "tiled")):
        s2, _ = gibbs_iteration(
            state, static, jnp.asarray(2, jnp.int32),
            block_size=opt.block_size, use_pallas=True,
            shared_na=shared_na, wave_size=8, megakernel=mega,
            gram_cached=False if not mega else None)
        outs[name] = jax.device_get(s2)

    a, b = outs["composed"], outs["tiled"]
    np.testing.assert_array_equal(np.asarray(b.comp), np.asarray(a.comp))
    np.testing.assert_array_equal(np.asarray(b.cass), np.asarray(a.cass))
    np.testing.assert_allclose(np.asarray(b.betas), np.asarray(a.betas),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.eps), np.asarray(a.eps),
                               rtol=1e-3, atol=2e-4)


def test_tiled_matches_resident_megakernel(tall_setup, monkeypatch):
    """Resident vs N-tiled mega-kernel: identical tile accumulation order
    means BIT-identical state after one iteration."""
    monkeypatch.setattr(pk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(skw, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "TILE_MAX_LANES", 1)
    opt, data, static, state = tall_setup
    shared_na = all(ph.nas == 0 for ph in data.phens)

    outs = {}
    for name, mega in (("resident", True), ("tiled", "tiled")):
        s2, _ = gibbs_iteration(
            state, static, jnp.asarray(2, jnp.int32),
            block_size=opt.block_size, use_pallas=True,
            shared_na=shared_na, wave_size=8, megakernel=mega)
        outs[name] = jax.device_get(s2)

    a, b = outs["resident"], outs["tiled"]
    np.testing.assert_array_equal(np.asarray(b.comp), np.asarray(a.comp))
    np.testing.assert_array_equal(np.asarray(b.betas), np.asarray(a.betas))
    np.testing.assert_array_equal(np.asarray(b.eps), np.asarray(a.eps))


def test_fused_block_kernel_matches_megakernel(small_setup, monkeypatch):
    """The fused per-block kernel (the sharded sweep's unit of work,
    block_sweep_pallas) must be BIT-identical to the whole-sweep
    mega-kernel on one device: same in-kernel math, eps carried through
    XLA instead of VMEM scratch (f32 adds identical either way)."""
    monkeypatch.setattr(pk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(skw, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "FORCE_INTERPRET", True)
    opt, data, static, state = small_setup
    shared_na = all(ph.nas == 0 for ph in data.phens)

    outs = {}
    for name, kw in (("mega", dict(megakernel=True)),
                     ("fused", dict(megakernel=False, fused=True))):
        s2, _ = gibbs_iteration(
            state, static, jnp.asarray(4, jnp.int32),
            block_size=opt.block_size, use_pallas=True,
            shared_na=shared_na, wave_size=8, **kw)
        outs[name] = jax.device_get(s2)

    a, b = outs["mega"], outs["fused"]
    np.testing.assert_array_equal(np.asarray(b.comp), np.asarray(a.comp))
    np.testing.assert_array_equal(np.asarray(b.betas), np.asarray(a.betas))
    np.testing.assert_array_equal(np.asarray(b.eps), np.asarray(a.eps))
    np.testing.assert_array_equal(np.asarray(b.cass), np.asarray(a.cass))


@pytest.fixture(scope="module")
def tall_na_setup(tmp_path_factory):
    """Multi-lane-tile rows WITH phenotype NAs (shared_na=False): covers
    the tiled kernel's per-trait na path."""
    out = str(tmp_path_factory.mktemp("tallnadata"))
    sim = simulate(out, n=2500, m=64, n_traits=2, n_causal=16, h2=0.5,
                   n_groups=1, na_rate=0.03, seed=13)
    opt = Options(bed_file=sim.bed, dim_file=sim.dim, phen_files=sim.phens,
                  group_index_file=sim.gri, group_mixture_file=sim.grm,
                  iterations=1, seed=5, block_size=32, wave_size=8,
                  use_pallas=True, output_thin_rate=10 ** 9)
    opt.validate()
    opt.load_group_mixtures()
    data = load_data(opt)
    static = build_static(data, opt, jnp.float32)
    state = init_sampler_state(data, opt, jnp.float32)
    return opt, data, static, state


def test_tiled_megakernel_with_nas(tall_na_setup, monkeypatch):
    """Tiled mega-kernel vs composed with per-trait NA masks (NT = T)."""
    monkeypatch.setattr(pk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(skw, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "TILE_MAX_LANES", 1)
    opt, data, static, state = tall_na_setup
    shared_na = all(ph.nas == 0 for ph in data.phens)
    assert not shared_na

    outs = {}
    for name, mega in (("composed", False), ("tiled", "tiled")):
        s2, _ = gibbs_iteration(
            state, static, jnp.asarray(2, jnp.int32),
            block_size=opt.block_size, use_pallas=True,
            shared_na=shared_na, wave_size=8, megakernel=mega,
            gram_cached=False if not mega else None)
        outs[name] = jax.device_get(s2)

    a, b = outs["composed"], outs["tiled"]
    np.testing.assert_array_equal(np.asarray(b.comp), np.asarray(a.comp))
    np.testing.assert_array_equal(np.asarray(b.cass), np.asarray(a.cass))
    np.testing.assert_allclose(np.asarray(b.betas), np.asarray(a.betas),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.eps), np.asarray(a.eps),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("B", [256, 512, 1024])
def test_win_recovery_digit_carry_exact(B):
    """The in-kernel win recovery (win = iota @ P, _block_scan_phase)
    carries indices through bf16 one-hot dots; above 256 it splits into
    base-256 digits.  Must be EXACT for every index at B = 512/1024
    (VERDICT r4 item 2: the UKB plan's B=512 depends on it)."""
    rng = np.random.default_rng(B)
    win = rng.permutation(B)
    perm_mat = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
                == jnp.asarray(win)[:, None]).astype(jnp.bfloat16)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    digits = ([(iota_i, 1.0)] if B <= 256
              else [(iota_i // 256, 256.0), (iota_i % 256, 1.0)])
    win_f = None
    for dig, scale in digits:
        r = jax.lax.dot_general(dig.astype(jnp.bfloat16), perm_mat,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        win_f = r * scale if win_f is None else win_f + r * scale
    np.testing.assert_array_equal(
        np.asarray(win_f)[0].astype(np.int64), win)


@pytest.fixture(scope="module")
def b512_setup(tmp_path_factory):
    """Two 512-marker blocks: exercises win indices > 256 in-kernel."""
    out = str(tmp_path_factory.mktemp("b512data"))
    sim = simulate(out, n=300, m=1024, n_traits=1, n_causal=64, h2=0.5,
                   n_groups=2, na_rate=0.02, seed=11)
    opt = Options(bed_file=sim.bed, dim_file=sim.dim,
                  phen_files=sim.phens,
                  group_index_file=sim.gri, group_mixture_file=sim.grm,
                  iterations=1, seed=5, block_size=512, wave_size=32,
                  use_pallas=True, output_thin_rate=10 ** 9)
    opt.validate()
    opt.load_group_mixtures()
    data = load_data(opt)
    static = build_static(data, opt, jnp.float32)
    state = init_sampler_state(data, opt, jnp.float32)
    return opt, data, static, state


def test_megakernel_block512(b512_setup, monkeypatch):
    """Mega vs composed agreement at B=512 (two-digit index carry +
    (2B)^2 Gram quadrants through the same kernels)."""
    monkeypatch.setattr(pk, "FORCE_INTERPRET", True)
    monkeypatch.setattr(skw, "FORCE_INTERPRET", True)
    monkeypatch.setattr(swk, "FORCE_INTERPRET", True)
    opt, data, static, state = b512_setup
    shared_na = all(ph.nas == 0 for ph in data.phens)

    outs = {}
    for name, mega in (("composed", False), ("mega", True)):
        s2, aux = gibbs_iteration(
            state, static, jnp.asarray(2, jnp.int32),
            block_size=512, use_pallas=True,
            shared_na=shared_na, wave_size=32, megakernel=mega)
        outs[name] = jax.device_get((s2, aux))

    a, b = outs["composed"][0], outs["mega"][0]
    np.testing.assert_array_equal(np.asarray(b.comp), np.asarray(a.comp))
    np.testing.assert_array_equal(np.asarray(b.cass), np.asarray(a.cass))
    np.testing.assert_allclose(np.asarray(b.betas), np.asarray(a.betas),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.eps), np.asarray(a.eps),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("B", [128, 512])
def test_gram_cache_xla_matches_pallas(b512_setup, B):
    """The XLA Gram-cache builder (used for B > 256 where the pallas
    builder exceeds VMEM) must be BITWISE equal to the pallas builder —
    exact-integer accumulation is order-independent."""
    opt, data, static, state = b512_setup
    bed = static.bed
    na = static.na
    m_pad = bed.shape[0]
    if m_pad % B:
        pytest.skip("shape mismatch")
    na_in = na[:1]
    a = swk._gram_cache_xla(bed, jnp.asarray(na_in, jnp.float32), B)
    call = swk._build_gram_cache_call(
        m_pad // B, B, bed.shape[1], 1, True, True,
        swk.pick_lane_tile(bed.shape[1]))
    b = call(bed, jnp.asarray(na_in, jnp.float32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
