"""Marker-sharded multi-device training via shard_map over a 1-D mesh.

TPU-native replacement for the reference's MPI protocol (SURVEY §2 C10):

- marker block partition over devices  <- set_block_of_markers
  (bayes.cpp:903-925), remainder to low shards, common padded per-shard
  length (the Mm idle-step scheme, bayes.cpp:375-382);
- per-block psum of the residual delta  <- the per-marker-step
  MPI_Allgatherv of (dbeta, mave, msig) + raw bed column replay
  (bayes.cpp:500-553); block_size=1 reproduces the reference's per-marker
  cadence exactly, larger blocks are the throughput mode;
- psum of per-group beta^2 / cass  <- MPI_Allreduce (bayes.cpp:575-589);
- replicated-key hyperparameter draws  <- rank-0 MPI_Bcast
  (bayes.cpp:626-650): every device draws the same values.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gmrm_tpu.config import Options
from gmrm_tpu.runner import (
    LoadedData, OutputSet, RunResult, load_data, init_sampler_state,
    round_up,
)
from gmrm_tpu.io.bed import read_bed, bed_bytes_per_marker
from gmrm_tpu.io.grouping import read_dim
from gmrm_tpu.ops.blockops import marker_stats_jax
from gmrm_tpu.parallel.mesh import MARKER_AXIS, make_marker_mesh, marker_blocks
from gmrm_tpu.sampler.gibbs import gibbs_iteration
from gmrm_tpu.sampler.state import SamplerState, StaticInputs, pad_bed


def _state_specs() -> SamplerState:
    rep = P()
    sh = P(None, MARKER_AXIS)
    return SamplerState(
        eps=rep, betas=sh, comp=sh, acum=sh, cass=rep, sigmag=rep,
        sigmae=rep, pi_est=rep, mu=rep, epssum=rep, key=rep,
    )


def _static_specs() -> StaticInputs:
    rep = P()
    return StaticInputs(
        bed=P(MARKER_AXIS), na=rep, mave=P(None, MARKER_AXIS),
        msig=P(None, MARKER_AXIS), group_of=P(MARKER_AXIS), mtotgrp=rep,
        nonas=rep, cva=rep, cvai=rep, n_total=rep, m_local=P(MARKER_AXIS),
    )


def make_sharded_step(mesh, *, block_size: int, use_pallas: bool = False,
                      donate: bool = True, shuffle: bool = True,
                      shared_na: bool = False):
    """Jitted sharded step (state, static, it) -> (state, aux)."""
    fn = partial(gibbs_iteration, block_size=block_size,
                 axis_name=MARKER_AXIS, use_pallas=use_pallas,
                 shuffle=shuffle, shared_na=shared_na)
    sspec, tspec = _state_specs(), _static_specs()
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(sspec, tspec, P()),
        out_specs=(sspec, P()),
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def load_data_sharded(opt: Options, n_shards: int) -> LoadedData:
    """Load the full dataset laid out as n_shards padded marker shards,
    concatenated: global arrays of length n_shards * m_pad_shard."""
    n, m_total = read_dim(opt.dim_file)
    if opt.trunc_markers:
        m_total = min(m_total, opt.trunc_markers)
    blocks = marker_blocks(m_total, n_shards)
    mm = max(ln for _, ln in blocks)
    m_pad_shard = round_up(max(mm, 1), opt.block_size)

    # Reuse the single-device loader for phenotypes / groups, then re-lay
    # the marker axis into padded shards.
    data = load_data(opt, m_pad=round_up(m_total, 1))
    mb, mb_pad = data.mb, data.mb_pad

    bed_global = data.bed[:m_total]
    group_global = data.group_of[:m_total]

    bed_sh = np.concatenate([
        pad_bed(bed_global[s:s + ln], m_pad_shard, mb_pad)
        for s, ln in blocks
    ], axis=0)
    group_sh = np.concatenate([
        np.concatenate([group_global[s:s + ln],
                        np.zeros(m_pad_shard - ln, np.int32)])
        for s, ln in blocks
    ])

    data.bed = bed_sh
    data.group_of = group_sh
    data.m_pad = n_shards * m_pad_shard
    return data


class ShardLayout:
    def __init__(self, m_total: int, n_shards: int, m_pad_shard: int):
        self.blocks = marker_blocks(m_total, n_shards)
        self.n_shards = n_shards
        self.m_pad_shard = m_pad_shard

    def gather_global(self, arr: np.ndarray) -> np.ndarray:
        """(T, n_shards*m_pad_shard) padded-shard layout -> (T, M_total)."""
        parts = []
        for i, (s, ln) in enumerate(self.blocks):
            a = i * self.m_pad_shard
            parts.append(arr[:, a:a + ln])
        return np.concatenate(parts, axis=1)


def run_training_sharded(opt: Options, n_devices: int = 0,
                         verbose: bool = True) -> RunResult:
    """The --process path over a marker-sharded device mesh."""
    opt.validate()
    if opt.cva is None:
        opt.load_group_mixtures()
    dtype = jnp.dtype(opt.dtype)

    mesh = make_marker_mesh(n_devices)
    d = mesh.devices.size
    data = load_data_sharded(opt, d)
    m_pad_shard = data.m_pad // d
    layout = ShardLayout(data.m_total, d, m_pad_shard)

    # m_local per shard, sharded so each device sees its own scalar.
    m_local = np.array([ln for _, ln in layout.blocks], np.int32)

    # Build static inputs directly (marker stats computed under the mesh).
    shard1 = NamedSharding(mesh, P(MARKER_AXIS))
    shard2 = NamedSharding(mesh, P(None, MARKER_AXIS))
    rep = NamedSharding(mesh, P())

    bed = jax.device_put(jnp.asarray(data.bed), shard1)
    na = jax.device_put(jnp.asarray(data.na, dtype), rep)
    nonas = jax.device_put(jnp.asarray(data.nonas, dtype), rep)

    stats_fn = jax.jit(
        jax.shard_map(
            lambda b, nn, no: marker_stats_jax(b, nn, no, dtype=dtype),
            mesh=mesh,
            in_specs=(P(MARKER_AXIS), P(), P()),
            out_specs=P(None, MARKER_AXIS),
        )
    )
    mave, msig = stats_fn(bed, na, nonas)
    valid = np.zeros(data.m_pad, bool)
    for i, (s, ln) in enumerate(layout.blocks):
        valid[i * m_pad_shard:i * m_pad_shard + ln] = True
    mave = jnp.where(jnp.asarray(valid)[None, :], mave, 0.0)
    msig = jnp.where(jnp.asarray(valid)[None, :], msig, 0.0)

    static = StaticInputs(
        bed=bed, na=na,
        mave=jax.device_put(mave, shard2),
        msig=jax.device_put(msig, shard2),
        group_of=jax.device_put(jnp.asarray(data.group_of), shard1),
        mtotgrp=jax.device_put(jnp.asarray(data.mtotgrp), rep),
        nonas=nonas,
        cva=jax.device_put(jnp.asarray(opt.cva, dtype), rep),
        cvai=jax.device_put(jnp.asarray(opt.cvai, dtype), rep),
        n_total=jax.device_put(jnp.asarray(float(data.n), dtype), rep),
        m_local=jax.device_put(jnp.asarray(m_local), shard1),
    )

    state = init_sampler_state(data, opt, dtype)
    # Re-place marker-axis leaves with their shardings.
    state = state.replace(
        eps=jax.device_put(state.eps, rep),
        betas=jax.device_put(state.betas, shard2),
        comp=jax.device_put(state.comp, shard2),
        acum=jax.device_put(state.acum, shard2),
        cass=jax.device_put(state.cass, rep),
        sigmag=jax.device_put(state.sigmag, rep),
        sigmae=jax.device_put(state.sigmae, rep),
        pi_est=jax.device_put(state.pi_est, rep),
        mu=jax.device_put(state.mu, rep),
        epssum=jax.device_put(state.epssum, rep),
        key=jax.device_put(state.key, rep),
    )

    use_pallas = opt.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    step = make_sharded_step(mesh, block_size=opt.block_size,
                             use_pallas=use_pallas,
                             shuffle=opt.shuffle_markers,
                             shared_na=all(ph.nas == 0 for ph in data.phens))

    outputs = OutputSet(opt, data)
    result = RunResult(state=state)
    beta_acc = None
    n_rec = 0

    for it in range(1, opt.iterations + 1):
        t0 = time.perf_counter()
        state, aux = step(state, static, jnp.asarray(it, jnp.int32))
        if it % opt.output_thin_rate == 0:
            rec = it // opt.output_thin_rate - 1
            state_host = jax.device_get(state)
            aux_host = jax.device_get(aux)
            betas_g = layout.gather_global(
                np.asarray(state_host.betas, np.float64))
            comp_g = layout.gather_global(np.asarray(state_host.comp))
            if outputs.enabled:
                sigmag = np.asarray(state_host.sigmag, np.float64)
                sigmae = np.asarray(state_host.sigmae, np.float64)
                pi = np.asarray(state_host.pi_est, np.float64)
                m0 = np.asarray(aux_host.m0)
                from gmrm_tpu.io.writers import (
                    format_csv_record, write_csv_record,
                )
                for ti in range(len(outputs.bet)):
                    row = format_csv_record(it, sigmag[ti], float(sigmae[ti]),
                                            int(m0[ti].sum()), pi[ti])
                    write_csv_record(outputs.csv_paths[ti], rec, row)
                    outputs.bet[ti].write_record(it, betas_g[ti], rec=rec)
                    outputs.cpn[ti].write_record(
                        it, comp_g[ti].astype(np.int32), rec=rec)
            if beta_acc is None:
                beta_acc = np.zeros_like(betas_g)
            beta_acc += betas_g
            n_rec += 1
        jax.block_until_ready(state.sigmae)
        result.iter_seconds.append(time.perf_counter() - t0)
        if verbose:
            print(f"RESULT : It {it}  total proc time = "
                  f"{result.iter_seconds[-1]:7.3f} sec")

    result.state = state
    if n_rec:
        result.beta_mean = beta_acc / n_rec
    return result
