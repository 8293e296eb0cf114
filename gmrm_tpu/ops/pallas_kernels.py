"""Fused Pallas TPU kernels for the block Gram / residual-update path.

These replace the XLA path in :mod:`gmrm_tpu.ops.blockops` for the two hot
O(N) ops of the sweep (the reference's ``dot_product`` ``src/bayes.cpp:709-770``
and rank-1 ``update_epsilon`` ``src/phenotype.cpp:326-393``).  The XLA path
is algebraically identical but materializes the decoded bf16 genotype planes
in HBM between the decode and each matmul — ~16x the packed bytes per pass,
measured as the 3.3 ms/iteration "null-scan" floor in
``benchmarking/PROFILE.md``.  Here the 2-bit decode happens *inside* the
kernel on VMEM-resident packed-uint8 tiles, so HBM sees only:

  packed bed tile (B x tn bytes)  +  eps/na tiles  ->  c (T,B), gs (T,B,B)

per grid step, with the Gram accumulated across lane tiles in VMEM scratch.

Math (same exact-bf16 strategy as blockops.py): decoded planes are small
integers, so the ``[A;B] @ [A;B]^T`` Gram quadrants are exact in bf16 with
f32 accumulation; the continuous ``eps`` is Dekker-split into bf16 hi+lo
(hi = bf16(x), lo = x - hi exact in f32) so ``x^T eps`` is reconstructed to
~2^-17 relative from two bf16 columns of one MXU pass.

The kernels additionally fold the ``msig`` scaling and emit ``c`` and the
scaled Gram ``gs`` directly (the XLA path computed raw craw/graw and scaled
them in separate HBM passes), and the Gram is laid out (T, B, B) so the
scan kernels slice it with static indexing — no transpose pass.

Layout notes: individuals live in *phase planes* (plane k = bed bit-pair k,
see ops/decode.py); within a kernel the four planes of a lane tile are
concatenated on the lane axis, which is semantically invisible because every
consumer reduces over individuals.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HAVE_PALLAS_KERNELS = True

# Test hook: force interpret-mode execution (CPU test suites).
FORCE_INTERPRET = False


def resolve_interpret(interpret: bool) -> bool:
    """Pallas kernels run in interpret mode automatically on CPU backends
    (the 8-device virtual-mesh test suite, multichip dryruns): the exact
    same kernel code path executes, minus Mosaic compilation.  On TPU this
    is a no-op unless ``interpret``/``FORCE_INTERPRET`` asks for it."""
    return bool(interpret or FORCE_INTERPRET
                or jax.default_backend() == "cpu")


def shard_varying(axis_name, *xs):
    """Under shard_map (``axis_name`` set) promote every operand to
    device-varying over that axis so a pallas_call sees uniform vma
    (check_vma=True rejects mixed replicated/varying kernel operands)."""
    if axis_name is None:
        return xs

    def f(x):
        try:
            if axis_name in jax.typeof(x).vma:
                return x
        except (AttributeError, TypeError):
            pass
        return jax.lax.pcast(x, (axis_name,), to='varying')

    return tuple(f(x) for x in xs)


def out_vma(axis_name):
    """``vma`` for pallas_call out ShapeDtypeStructs under shard_map."""
    return None if axis_name is None else frozenset((axis_name,))


def sds(shape, dtype, vma=None):
    """ShapeDtypeStruct with vma only when running under shard_map."""
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


_LANES = 512          # packed-byte lane tile (4 individuals/byte -> 2048)
_BF16 = jnp.bfloat16
_F32 = jnp.float32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tn(mb: int) -> int:
    """Lane-tile width over packed bytes: full _LANES when the column axis
    is long, else the whole (128-aligned) width in one step."""
    return min(_LANES, _round_up(mb, 128))


def _decode_tile(bed_u8, mask):
    """Decode a (B, tn) uint8 tile -> (a, b) each (B, 4*tn) bf16, the four
    phase planes concatenated on the lane axis.  ``mask`` (1, tn) zeroes
    out-of-range byte columns (partial last grid step).

    Code semantics (reference LUT generator ``src/lut/mk_lut.cpp:25-36``):
    00 -> a=2,b=1; 01 (missing) -> a=0,b=0; 10 -> a=1,b=1; 11 -> a=0,b=1.
    """
    c = bed_u8.astype(jnp.int32)
    a_planes, b_planes = [], []
    for k in range(4):
        ck = (c >> (2 * k)) & 3
        bk = ((ck != 1) & mask).astype(jnp.int32)
        # a = ((4-ck)>>1)*b maps 00->2, 01->0, 10->1, 11->0 in 3 VPU ops
        # (vs the 2-op compare + select chain) — the decode runs twice per
        # block in the hot sweep and is VPU-bound.
        ak = ((4 - ck) >> 1) * bk
        a_planes.append(ak)
        b_planes.append(bk)
    a = jnp.concatenate(a_planes, axis=1).astype(_BF16)
    b = jnp.concatenate(b_planes, axis=1).astype(_BF16)
    return a, b


def _flatten_planes(ref_rows):
    """Concatenate four (R, tn) plane slices into (R, 4*tn)."""
    return jnp.concatenate(ref_rows, axis=1)


# --------------------------------------------------------------------------
# Fused decode + Gram + dot-products kernel
# --------------------------------------------------------------------------

def _gram_kernel(bed_ref, eps_ref, na_ref, mave_ref, msig_ref,
                 c_ref, gs_ref, gfull_ref, cab_ref,
                 *, mb, tn, n_traits, shared_na):
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    T = n_traits
    B = bed_ref.shape[0]

    @pl.when(i == 0)
    def _():
        gfull_ref[...] = jnp.zeros(gfull_ref.shape, _F32)
        cab_ref[...] = jnp.zeros(cab_ref.shape, _F32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
    mask = (i * tn + lane) < mb                          # (1, tn)
    a, b = _decode_tile(bed_ref[...], mask)              # (B, 4tn) bf16
    ab = jnp.concatenate([a, b], axis=0)                 # (2B, 4tn)

    mask4 = jnp.concatenate([mask] * 4, axis=1)          # (1, 4tn)
    eps_t = _flatten_planes([eps_ref[:, k, :] for k in range(4)])  # (T, 4tn)
    eps_t = jnp.where(mask4, eps_t, 0.0)
    hi = eps_t.astype(_BF16)
    lo = (eps_t - hi.astype(_F32)).astype(_BF16)
    rhs = jnp.concatenate([hi, lo], axis=0)              # (2T, 4tn)

    # x^T eps for both planes of every marker: one skinny MXU pass.
    cab_ref[...] += jax.lax.dot_general(
        rhs, ab, (((1,), (1,)), ((), ())),
        preferred_element_type=_F32)                     # (2T, 2B)

    # All Gram quadrants in one (2B, 2B) MXU pass per NA mask:
    # gfull[r, c] = sum_i na_i * ab[r, i] * ab[c, i].
    if shared_na:
        na_t = _flatten_planes([na_ref[k:k + 1, :] for k in range(4)])
        na_t = jnp.where(mask4, na_t, 0.0).astype(_BF16)   # (1, 4tn)
        gfull_ref[0] += jax.lax.dot_general(
            ab * na_t, ab, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32)
    else:
        for t in range(T):
            na_t = _flatten_planes(
                [na_ref[t, k:k + 1, :] for k in range(4)])
            na_t = jnp.where(mask4, na_t, 0.0).astype(_BF16)
            gfull_ref[t] += jax.lax.dot_general(
                ab * na_t, ab, (((1,), (1,)), ((), ())),
                preferred_element_type=_F32)

    @pl.when(i == nsteps - 1)
    def _():
        cab = cab_ref[...]
        csum = cab[:T] + cab[T:]                         # (T, 2B) hi+lo
        mave = mave_ref[...]                             # (T, B)
        msig = msig_ref[...]
        craw = csum[:, :B] - mave * csum[:, B:]
        c_ref[...] = msig * craw
        for t in range(T):
            gf = gfull_ref[0 if shared_na else t]        # (2B, 2B)
            g1 = gf[:B, :B]                              # sum na a_j a_i
            g2 = gf[B:, :B]                              # sum na b_j a_i
            g2t = gf[:B, B:]                             # sum na a_j b_i
            g3 = gf[B:, B:]                              # sum na b_j b_i
            mr = mave_ref[t:t + 1, :]                    # (1, B): m_i
            mc = jnp.transpose(mr)                       # (B, 1): m_j
            sr = msig_ref[t:t + 1, :]
            sc = jnp.transpose(sr)
            graw = g1 - mr * g2t - mc * g2 + (mc * mr) * g3
            gs_ref[t] = (sc * sr) * graw


@functools.lru_cache(maxsize=None)
def _build_gram_call(B, mb, T, shared_na, interpret, vma=None):
    tn = _pick_tn(mb)
    grid = pl.cdiv(mb, tn)
    kern = functools.partial(_gram_kernel, mb=mb, tn=tn, n_traits=T,
                             shared_na=shared_na)
    na_spec = (pl.BlockSpec((4, tn), lambda i: (0, i)) if shared_na
               else pl.BlockSpec((T, 4, tn), lambda i: (0, 0, i)))
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, tn), lambda i: (0, i)),         # bed
            pl.BlockSpec((T, 4, tn), lambda i: (0, 0, i)),   # eps
            na_spec,                                          # na
            pl.BlockSpec((T, B), lambda i: (0, 0)),           # mave
            pl.BlockSpec((T, B), lambda i: (0, 0)),           # msig
        ],
        out_specs=[
            pl.BlockSpec((T, B), lambda i: (0, 0)),           # c
            pl.BlockSpec((T, B, B), lambda i: (0, 0, 0)),     # gs
        ],
        out_shape=[
            sds((T, B), _F32, vma),
            sds((T, B, B), _F32, vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((1 if shared_na else T, 2 * B, 2 * B), _F32),
            pltpu.VMEM((2 * T, 2 * B), _F32),
        ],
        interpret=interpret,
    )


def block_gram_scaled_pallas(bed_block, eps, na, mave, msig, *,
                             dtype=jnp.float32, shared_na=False,
                             interpret=False, axis_name=None):
    """Fused decode + Gram for one marker block, msig scaling folded in.

    Args match :func:`gmrm_tpu.ops.blockops.block_gram` plus ``msig``:
      bed_block (B, mb) uint8, eps (T, 4, mb), na (T, 4, mb),
      mave/msig (T, B).

    Returns:
      c  (T, B)   = msig * (x^T eps)          (block_scan's ``c``)
      gs (T, B, B) = msig_j * msig_i * graw    (block_scan's ``gs``)
    """
    if dtype != jnp.float32:
        # Oracle-grade wide path (CPU float64 runs): XLA einsums.
        from gmrm_tpu.ops.blockops import block_gram
        craw, graw = block_gram(bed_block, eps, na, mave, dtype=dtype,
                                shared_na=shared_na)
        return msig * craw, msig[:, :, None] * msig[:, None, :] * graw

    B, mb = bed_block.shape
    T = eps.shape[0]
    call = _build_gram_call(B, mb, T, bool(shared_na),
                            resolve_interpret(interpret),
                            out_vma(axis_name))
    na_in = na[0] if shared_na else na
    args = shard_varying(
        axis_name, bed_block, eps.astype(_F32), na_in.astype(_F32),
        mave.astype(_F32), msig.astype(_F32))
    c, gs = call(*args)
    return c.astype(dtype), gs.astype(dtype)


# --------------------------------------------------------------------------
# Fused decode + dot-products-only kernel (Gram comes from the cache)
# --------------------------------------------------------------------------

def _cdot_kernel(bed_ref, eps_ref, mave_ref, msig_ref, c_ref, cab_ref,
                 *, mb, tn, n_traits):
    """The residual dot products of :func:`_gram_kernel` WITHOUT the Gram
    (the Gram is iteration-invariant and comes from build_gram_cache on
    this path).  Identical tile/accumulation structure so ``c`` is
    bit-identical to the fused Gram kernel's."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    T = n_traits
    B = bed_ref.shape[0]

    @pl.when(i == 0)
    def _():
        cab_ref[...] = jnp.zeros(cab_ref.shape, _F32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
    mask = (i * tn + lane) < mb
    a, b = _decode_tile(bed_ref[...], mask)              # (B, 4tn) bf16
    ab = jnp.concatenate([a, b], axis=0)                 # (2B, 4tn)

    mask4 = jnp.concatenate([mask] * 4, axis=1)
    eps_t = _flatten_planes([eps_ref[:, k, :] for k in range(4)])
    eps_t = jnp.where(mask4, eps_t, 0.0)
    hi = eps_t.astype(_BF16)
    lo = (eps_t - hi.astype(_F32)).astype(_BF16)
    rhs = jnp.concatenate([hi, lo], axis=0)              # (2T, 4tn)

    cab_ref[...] += jax.lax.dot_general(
        rhs, ab, (((1,), (1,)), ((), ())),
        preferred_element_type=_F32)                     # (2T, 2B)

    @pl.when(i == nsteps - 1)
    def _():
        cab = cab_ref[...]
        csum = cab[:T] + cab[T:]
        craw = csum[:, :B] - mave_ref[...] * csum[:, B:]
        c_ref[...] = msig_ref[...] * craw


@functools.lru_cache(maxsize=None)
def _build_cdot_call(B, mb, T, interpret, vma=None):
    tn = _pick_tn(mb)
    grid = pl.cdiv(mb, tn)
    kern = functools.partial(_cdot_kernel, mb=mb, tn=tn, n_traits=T)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, tn), lambda i: (0, i)),         # bed
            pl.BlockSpec((T, 4, tn), lambda i: (0, 0, i)),   # eps
            pl.BlockSpec((T, B), lambda i: (0, 0)),          # mave
            pl.BlockSpec((T, B), lambda i: (0, 0)),          # msig
        ],
        out_specs=pl.BlockSpec((T, B), lambda i: (0, 0)),
        out_shape=sds((T, B), _F32, vma),
        scratch_shapes=[pltpu.VMEM((2 * T, 2 * B), _F32)],
        interpret=interpret,
    )


def block_cdot_pallas(bed_block, eps, mave, msig, *, interpret=False,
                      axis_name=None):
    """c (T, B) = msig * (x^T eps) for one block, fused decode; the
    cached-Gram path's replacement for block_gram_scaled_pallas."""
    B, mb = bed_block.shape
    T = eps.shape[0]
    call = _build_cdot_call(B, mb, T, resolve_interpret(interpret),
                            out_vma(axis_name))
    args = shard_varying(axis_name, bed_block, eps.astype(_F32),
                         mave.astype(_F32), msig.astype(_F32))
    return call(*args)


# --------------------------------------------------------------------------
# Fused decode + residual-update kernel
# --------------------------------------------------------------------------

def _eps_update_kernel(bed_ref, lhs_ref, na_ref, out_ref, *, n_traits):
    """deps[t, k, :] = na[t, k, :] * (sum_j d_tj a_jk - md_tj b_jk) where
    lhs rows are [d_t | -md_t] (T, 2B); hi/lo bf16 split done here."""
    T = n_traits
    tn = bed_ref.shape[1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
    mask = lane >= 0                                     # decode needs a mask
    a, b = _decode_tile(bed_ref[...], mask)              # (B, 4tn) bf16

    lhs = lhs_ref[...]                                   # (T, 2B) f32
    hi = lhs.astype(_BF16)
    lo = (lhs - hi.astype(_F32)).astype(_BF16)
    lhs2 = jnp.concatenate([hi, lo], axis=0)             # (2T, 2B)

    ab = jnp.concatenate([a, b], axis=0)                 # (2B, 4tn)
    out = jax.lax.dot_general(
        lhs2, ab, (((1,), (0,)), ((), ())),
        preferred_element_type=_F32)                     # (2T, 4tn)
    deps = out[:T] + out[T:]                             # (T, 4tn)
    for k in range(4):
        out_ref[:, k, :] = (deps[:, k * tn:(k + 1) * tn]
                            * na_ref[:, k, :])


@functools.lru_cache(maxsize=None)
def _build_eps_update_call(B, mb, T, interpret, vma=None):
    tn = _pick_tn(mb)
    grid = pl.cdiv(mb, tn)
    kern = functools.partial(_eps_update_kernel, n_traits=T)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, tn), lambda i: (0, i)),          # bed
            pl.BlockSpec((T, 2 * B), lambda i: (0, 0)),       # lhs
            pl.BlockSpec((T, 4, tn), lambda i: (0, 0, i)),    # na
        ],
        out_specs=pl.BlockSpec((T, 4, tn), lambda i: (0, 0, i)),
        out_shape=sds((T, 4, mb), _F32, vma),
        interpret=interpret,
    )


def block_eps_update_pallas(bed_block, dbeta_scaled, na, mave, *,
                            dtype=jnp.float32, interpret=False,
                            axis_name=None):
    """Residual delta from a block's accepted moves (fused decode).

    deps (T, 4, mb) = na * sum_j dbeta_scaled[t, j] * (a_j - mave_tj b_j),
    the batched reference rank-1 update (``phenotype.cpp:326-393``).
    """
    if dtype != jnp.float32:
        from gmrm_tpu.ops.blockops import block_eps_update
        return block_eps_update(bed_block, dbeta_scaled, na, mave,
                                dtype=dtype)
    B, mb = bed_block.shape
    T = dbeta_scaled.shape[0]
    d = dbeta_scaled.astype(_F32)
    lhs = jnp.concatenate([d, -(mave.astype(_F32) * d)], axis=1)  # (T, 2B)
    call = _build_eps_update_call(B, mb, T, resolve_interpret(interpret),
                                  out_vma(axis_name))
    deps = call(*shard_varying(axis_name, bed_block, lhs,
                               na.astype(_F32)))
    return deps.astype(dtype)
