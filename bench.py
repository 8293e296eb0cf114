"""Benchmark driver: one JSON line with the headline metric.

Workload: the reference's correctness-anchor scale (N=10,000 x Mt=20,000,
4 traits — example/test.dim:1, example/part1_gcc_mvapich2.sh) run for a few
Gibbs iterations on the current default JAX device.

Metric: markers/s per Gibbs sweep (Mt * iters / wall-clock, steady state;
each marker step serves all 4 traits).

vs_baseline: ratio against the COMPILED reference gmrm (unmodified
/root/reference/src built via baseline/Makefile with a single-rank MPI
stub + boost shims, -Ofast -march=native -fopenmp -DMANVECT), measured on
this host by baseline/run_baseline.py and recorded in
baseline/BASELINE_MEASURED.json.  If that record is missing, the harness
builds and measures it inline; the old single-thread NumPy oracle number
stays in detail for continuity.

Timing method: everything (data load, jit trace, compile, marker stats) is
built ONCE; the steady state is the best of REPEATS timed batches of
MEAS_ITERS back-to-back iterations, each bracketed by block_until_ready.
(An earlier delta-of-two-process-runs scheme was noise-dominated by
per-process tracing/compile-cache variance and could even go negative.)

MEAS_ITERS is deep (100) because this device sits behind a ~25-30 ms
dispatch tunnel: a 10-iteration batch measures ~3 ms/iter of tunnel
latency on top of the true device time (round-3 sweep: 6.75/5.25/
4.34/3.88/3.75 ms per iter at batches 10/20/50/100/200; the round-4
in-kernel-prep kernel runs ~2.3 ms/iter at batch 100).  Production
chains dispatch thousands of iterations between thin writes exactly like
this loop (runner.py dispatches back-to-back without per-iteration
syncs), so the deep batch reflects real steady-state throughput.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gmrm_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


N, MT, TRAITS = 10_000, 20_000, 4
WARM_ITERS, MEAS_ITERS, REPEATS = 3, 100, 3
ORACLE_MARKERS = 600  # truncated serial-oracle run, extrapolated


def build_dataset(tmp="/tmp/gmrm_bench_data"):
    from gmrm_tpu.io.sim import simulate
    marker = os.path.join(tmp, "test.bed")
    if not os.path.exists(marker):
        simulate(tmp, n=N, m=MT, n_traits=TRAITS, n_causal=MT // 4, h2=0.5,
                 n_groups=1, na_rate=0.0, seed=171014,
                 mixtures=np.array([0.0, 0.0001, 0.001, 0.01]))
    return tmp


def bench_tpu(data_dir):
    import jax
    import jax.numpy as jnp
    from gmrm_tpu.config import Options
    from gmrm_tpu.runner import load_data, build_static, init_sampler_state
    from gmrm_tpu.sampler.gibbs import make_gibbs_step

    # block_size/wave_size from the measured sweeps in benchmarking/
    # PROFILE.md; wave_size=32 is the W-co-scheduled-shards relaxation
    # validated against the compiled reference's chains at 3 seeds
    # (benchmarking/EQUIVALENCE.md PASS, pooled h2 diff 0.0002-0.0044).
    opt = Options(
        bed_file=f"{data_dir}/test.bed", dim_file=f"{data_dir}/test.dim",
        phen_files=[f"{data_dir}/test{i+1}.phen" for i in range(TRAITS)],
        group_index_file=f"{data_dir}/test.gri",
        group_mixture_file=f"{data_dir}/test.grm",
        iterations=1, seed=42, block_size=128, wave_size=32,
        output_thin_rate=100_000,
    )
    opt.validate()
    opt.load_group_mixtures()
    dtype = jnp.float32

    data = load_data(opt, interleave=opt.wave_size > 1)
    static = build_static(data, opt, dtype)
    state = init_sampler_state(data, opt, dtype)
    use_pallas = jax.default_backend() not in ("cpu",)
    shared_na = all(ph.nas == 0 for ph in data.phens)
    step = make_gibbs_step(block_size=opt.block_size, use_pallas=use_pallas,
                           donate=True, shared_na=shared_na,
                           wave_size=opt.wave_size if use_pallas else 1)

    # Report (and gate) whether the whole-sweep mega-kernel is active: it
    # auto-enables when VMEM fits (gibbs.marker_sweep).  When active, one
    # composed-vs-mega iteration must agree bit-for-bit on device before
    # anything is timed — a Mosaic regression must fail loudly, not ship a
    # fast wrong number (benchmarking/PROFILE.md round-3 validation).
    # gram_cache is the authoritative prerequisite (built only when the
    # whole block-mode condition set holds — build_static); vmem_fits
    # alone would report megakernel:true while comparing composed vs
    # composed below.
    mega_active = False
    if (use_pallas and opt.wave_size > 1
            and opt.block_size % opt.wave_size == 0
            and static.gram_cache is not None):
        from gmrm_tpu.ops.sweep_kernel import vmem_fits
        mega_active = vmem_fits(TRAITS, opt.block_size, static.bed.shape[1])
    if mega_active:
        # gram_cached=False: the gate's composed side must RECOMPUTE the
        # Gram so it stays independent of the cache the mega side reads.
        gate_comp = make_gibbs_step(
            block_size=opt.block_size, use_pallas=True, donate=False,
            shared_na=shared_na, wave_size=opt.wave_size,
            megakernel=False, gram_cached=False, pallas_upd=True)
        gate_mega = make_gibbs_step(
            block_size=opt.block_size, use_pallas=True, donate=False,
            shared_na=shared_na, wave_size=opt.wave_size, megakernel=True)
        it1 = jnp.asarray(1, jnp.int32)
        s_a, _ = gate_comp(state, static, it1)
        s_b, _ = gate_mega(state, static, it1)
        s_a, s_b = jax.device_get((s_a, s_b))
        comp_eq = np.array_equal(np.asarray(s_a.comp), np.asarray(s_b.comp))
        db = float(np.max(np.abs(np.asarray(s_a.betas)
                                 - np.asarray(s_b.betas))))
        de = float(np.max(np.abs(np.asarray(s_a.eps) - np.asarray(s_b.eps))))
        if not comp_eq or db > 1e-6 or de > 1e-6:
            print(f"FATAL: mega-kernel disagrees with composed path on "
                  f"device (comp_equal={comp_eq} max|dbeta|={db:.3e} "
                  f"max|deps|={de:.3e})", file=sys.stderr)
            sys.exit(1)
        print("# mega agreement gate: PASS (bit-identical)",
              file=sys.stderr, flush=True)

    it = 1
    for _ in range(WARM_ITERS):
        state, _ = step(state, static, jnp.asarray(it, jnp.int32))
        it += 1
    jax.block_until_ready(state.sigmae)

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(MEAS_ITERS):
            state, _ = step(state, static, jnp.asarray(it, jnp.int32))
            it += 1
        jax.block_until_ready(state.sigmae)
        best = min(best, (time.perf_counter() - t0) / MEAS_ITERS)
    return MT / best, best, {"megakernel": mega_active,
                             "block_size": opt.block_size,
                             "wave_size": opt.wave_size,
                             "use_pallas": use_pallas}


def bench_oracle_cpu(data_dir):
    """Single-thread float64 serial recursion (reference port-of-record),
    truncated to ORACLE_MARKERS and extrapolated to a full sweep."""
    from gmrm_tpu import oracle
    from gmrm_tpu.io.bed import read_bed, unpack_codes, decode_planes
    from gmrm_tpu.io.phen import read_phen

    m = ORACLE_MARKERS
    bed = read_bed(f"{data_dir}/test.bed", N, MT, 0, m)
    phs = [read_phen(f"{data_dir}/test{i+1}.phen", N) for i in range(TRAITS)]
    codes = unpack_codes(bed, 4 * bed.shape[1])
    a, b = decode_planes(codes)
    napad = phs[0].na_vector_padded()
    a *= napad
    b *= napad
    cva = np.array([[0.0, 0.0001, 0.001, 0.01]])
    cvai = np.zeros_like(cva)
    cvai[:, 1:] = 1.0 / cva[:, 1:]
    gidx = np.zeros(m, np.int64)
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    for ph in phs:
        mave, msig = oracle.marker_stats(a, b, napad, ph.nonas)
        st = oracle.OracleState(
            eps=ph.epsilon_padded().copy(), betas=np.zeros(m),
            comp=np.zeros(m, np.int64), acum=np.zeros(m),
            cass=np.zeros((1, 4), np.int64), sigmag=np.array([0.3]),
            sigmae=0.7, pi_est=np.array([[0.7, 0.1, 0.1, 0.1]]),
            mu=0.0, nonas=ph.nonas,
        )
        oracle.sweep_serial(
            st, a, b, napad, mave, msig, gidx, cva, cvai,
            np.arange(m), rng.uniform(size=m), rng.normal(size=m), N,
        )
    dt = time.perf_counter() - t0
    return m / dt  # markers/s for a full multi-trait sweep


def reference_baseline_markers_per_s():
    """markers/s of the compiled reference gmrm on this class of host.

    Prefers the committed measurement (baseline/BASELINE_MEASURED.json,
    produced by baseline/run_baseline.py); falls back to building and
    timing it inline when absent and the reference tree is available.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    rec_path = os.path.join(here, "baseline", "BASELINE_MEASURED.json")
    if os.path.exists(rec_path):
        with open(rec_path) as fh:
            rec = json.load(fh)
        return rec["markers_per_s"], rec
    import statistics
    import subprocess
    sys.path.insert(0, os.path.join(here, "baseline"))
    import run_baseline as rb
    rb.build()
    iter_s, _, _ = rb.run_reference("/tmp/gmrm_bench_data", 8,
                                    os.cpu_count())
    med = statistics.median(iter_s[2:] if len(iter_s) > 4 else iter_s)
    return MT / med, {"markers_per_s": MT / med, "measured": "inline"}


def main():
    t0 = time.perf_counter()
    data_dir = build_dataset()
    print(f"# dataset ready {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    markers_per_s, steady, cfg = bench_tpu(data_dir)
    print(f"# tpu bench done {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    try:
        ref, rec = reference_baseline_markers_per_s()
        vs = markers_per_s / ref
    except Exception:
        ref, rec, vs = None, None, None
    try:
        oracle_ms = bench_oracle_cpu(data_dir)
    except Exception:
        oracle_ms = None
    out = {
        "metric": "gibbs_markers_per_s",
        "value": round(markers_per_s, 1),
        "unit": "markers/s (N=10k, 4 traits)",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "iter_ms": round(steady * 1000, 2),
            **cfg,
            "baseline_compiled_gmrm_markers_per_s":
                round(ref, 1) if ref else None,
            "baseline_omp_threads":
                rec.get("omp_threads") if rec else None,
            # per-core normalization: this box runs the reference on 2
            # cores; its intended config is 2 ranks x 18 threads.  The
            # honest cross-hardware comparator is markers/s per CPU core.
            "baseline_markers_per_s_per_core":
                round(ref / rec["omp_threads"], 1)
                if rec and rec.get("omp_threads") else None,
            "vs_baseline_36core_est":
                round(markers_per_s / (ref / rec["omp_threads"] * 36), 2)
                if rec and rec.get("omp_threads") else None,
            "oracle_numpy_markers_per_s":
                round(oracle_ms, 1) if oracle_ms else None,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
