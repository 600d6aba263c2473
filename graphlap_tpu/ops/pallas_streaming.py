"""Fused Pallas streaming matvecs: kernel tiles never touch HBM.

The XLA streaming operators (ops/streaming.py) materialize each recomputed
K block in HBM between the exp and the consuming dot (~2 GB of traffic per
8 MP block-sweep). These kernels fuse  distance-GEMM -> exp -> dot  inside
VMEM tiles — the flash-attention pattern for this workload (SURVEY.md §5
long-context row):

    matvec   out(p)   = sum_j exp(-d2(F_A, F_j)) @ v_j     (K v)
    rmatvec  out_j(n) = exp(-d2(F_A, F_j))^T @ t           (K^T t)

Tiling: the sample block F_A is small (p <= ~4k rows of 128 features =
1-2 MB), so it sits in VMEM WHOLE and the grid runs over N tiles only —
one feature fetch per pass, no per-p-tile refetch, and few, fat grid steps
(the first cut used (p/512) x (N/512) tiles and died of grid overhead +
8x feature traffic: 7.9 s vs 7.1 s XLA at 8 MP).

Caller contract: features zero-padded to a 32-multiple width ``dp``
(``d_pad_of``; kernels infer it from the input shapes) and row counts
padded to the tile multiples (zero feature rows/columns are exact no-ops
as long as the paired vector entries are zero). The transposed feature
matrix (dp, n_pad) is built ONCE by the caller and reused across all
passes. dtype=bf16 runs distances, exp, and dots in bf16 with f32
accumulation.

Why dp = 32 and not one full 128-lane MXU block: the transposed feature
copy is the ONLY O(N)-resident buffer the fused path adds, and at
D=128 it is 5.1x the (N, 25) NLM data — 8.6/17.2 GB at 32/64 MP bf16,
which is exactly what forced the capacity rows (benchmarks rows 6/7)
off Pallas onto the slower XLA operators. Padding d=25 to the sublane
tile instead (32 covers f32's 8 and bf16's 16) keeps the copy at 1.28x
(2.1/4.3 GB), and the skinny-K cross GEMM costs the MXU no more than
the zero-padded K=128 one it replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D_PAD = 128      # max supported feature width (NLM 7x7 + bilateral fits)
MAX_TILE_P = 4096


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def d_pad_of(d: int) -> int:
    """Feature width padded to the 32-sublane tile (see module docstring).

    32 is the smallest width aligned for both f32 (8-sublane) and bf16
    (16-sublane) feature tiles, so one layout serves every dtype policy.
    """
    if d > D_PAD:
        raise ValueError(f"feature dim {d} > {D_PAD}; add a k-loop")
    return max(32, _cdiv(d, 32) * 32)


def _check_dp(feats_a_pad, f_t) -> int:
    """Validate the caller-built pads agree and return the width."""
    dp = feats_a_pad.shape[1]
    if f_t.shape[0] != dp:
        raise ValueError(
            f"feature pads disagree: fa_pad width {dp} vs f_t height "
            f"{f_t.shape[0]} — build both with d_pad_of")
    if dp % 32 != 0 or dp > D_PAD:
        raise ValueError(f"padded feature width {dp} must be a multiple "
                         f"of 32 and <= {D_PAD} (d_pad_of)")
    return dp


def p_tiling(p: int) -> tuple[int, int]:
    """(tile, p_pad): sample-axis tile <= MAX_TILE_P with exact division.

    p <= 4096 gets one whole-p tile; larger p splits into the fewest tiles
    of equal (512-aligned) size, minimizing pad waste.
    """
    k = _cdiv(p, MAX_TILE_P)
    tp = _cdiv(_cdiv(p, k), 512) * 512
    return tp, tp * k


def _tile_p_of(p_pad: int) -> int:
    return p_pad // _cdiv(p_pad, MAX_TILE_P)


def _tile_n(dtype) -> int:
    # the PAD QUANTUM for the n axis (callers pad n_pad to a multiple of
    # this), NOT the widest tile the kernels run: _pick_tn grows the
    # actual column tile past it when n_pad allows. f32 keeps the narrow
    # quantum: at (4096, 512) the f32 kb + d2 stack intermediates
    # measured 17.92 MB scoped VMEM — over Mosaic's DEFAULT 16 MB limit,
    # a real compile failure for -pallas without -bf16 at 1024^2-class
    # images before the limit was raised (VMEM_LIMIT_BYTES below)
    return 1024 if dtype == jnp.bfloat16 else 256


# Mosaic's default scoped-VMEM limit is 16 MB — a compiler default, not
# the hardware (a v5e core carries ~128 MiB of VMEM). Raising it to 64 MB
# admits wider column tiles: fewer, fatter grid steps on the same
# schedule. Measured at the 8 MP cfg4 shape (benchmarks/sweep_vmem_tiles
# .py -> results/vmem_tiles.jsonl, bf16): matvec 0.1063 -> 0.1018 s
# (tn 1024 -> 4096), rmatvec 0.0903 -> 0.0879 (1024 -> 4096), ext2
# 0.1377 -> 0.1342 (1024 -> 2048), finish 0.1416 -> 0.1349 (512 -> 2048).
# tn=4096 REGRESSES the two fused-finish kernels (0.154/0.156 — the
# whole-p tile plus four n-wide buffers outgrow pipelining headroom), so
# each kernel carries its own measured cap. The raised limit alone is
# wall-neutral at the old tiles (within noise across the sweep grid).
VMEM_LIMIT_BYTES = 64 << 20


def _cparams():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def _pick_tn(n_pad: int, dtype, cap: int) -> int:
    """Widest measured-safe column tile: grows the _tile_n quantum by
    powers of two while it divides n_pad, up to the kernel's ``cap``.
    Callers' pad contract is unchanged (n_pad % _tile_n == 0); bigger
    tiles are an internal schedule choice, exact for any divisor."""
    t = _tile_n(dtype)
    while t * 2 <= cap and n_pad % (t * 2) == 0:
        t *= 2
    return t


# Measured-optimal caps per kernel (vmem_tiles.jsonl; f32 keeps the
# quantum — unswept on-chip, and the f32 paths are non-headline).
# ext2's cap is the quantum: with its VPU consume (ab_matvec_consume
# .jsonl ext2 rows) tn=1024 beats 2048 (0.1184 vs 0.1250) — the f32
# product temp grows with the tile and squeezes pipelining headroom.
MATVEC_TN_CAP = 4096
EXT2_TN_CAP = 1024
FIN_TN_CAP = 2048


def _kb_tile(a, bt, dtype):
    """(tile_p, tile_n) kernel tile from feature tiles, in ``dtype``."""
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    cross = jnp.dot(a, bt, preferred_element_type=jnp.float32, precision=prec)
    af = a.astype(jnp.float32)
    bf = bt.astype(jnp.float32)
    na = jnp.sum(af * af, axis=1, keepdims=True)
    nb = jnp.sum(bf * bf, axis=0, keepdims=True)
    d2 = jnp.maximum(na + nb - 2.0 * cross, 0.0)
    if dtype == jnp.bfloat16:
        return jnp.exp(-d2.astype(jnp.bfloat16))
    return jnp.exp(-d2)


# Augmented-GEMM distance layout (kernel_sched.jsonl aug2_* rows): the
# distance emerges straight from the MXU accumulator, removing the
# in-kernel norm recompute + f32 casts from the VPU chain — measured
# 0.118 -> 0.100 s on ext2 and 0.102 -> 0.070 s on matvec at the 8 MP
# shape. Operand layout (aug_pads):
#
#     fa' = [-2 f_r, na_hi, na_mid, na_lo, 1, 1, 1, 0...]      (p_pad, dp)
#     ft' = [ f_r,   1,     1,      1, nb_hi, nb_mid, nb_lo, 0...]
#
# with f_r the bf16-ROUNDED features, na/nb their exact f32 square norms
# carried as THREE-lane compensated bf16 splits (hi = bf16(x), then two
# residue lanes). bf16 products accumulate exactly in f32, so the aug d2
# equals the plain tile's norms+cross composition up to the split
# residue — ~2^-24 |f|^2 with three lanes, which re-quantizes to the
# IDENTICAL bf16 kernel tile on real NLM features (aug_numerics probe:
# kb diff exactly 0 after the bf16 d2 cast). Three lanes cost nothing at
# NLM d=25: d+6=31 pads to the same dp=32.
#
# r5 REGRESSION POST-MORTEM (matrix rows ts 1787205xxx: 0.65-0.88 dB at
# 8 MP; 1 MP bisect: rmatvec-only -0.33 dB, both -0.67 dB): the culprit
# was NOT the split residue — XLA:TPU's excess-precision simplifier was
# eliding the f32->bf16->f32 round-trips inside the fused jit, computing
# na/nb from UNROUNDED features (the very GEMM-trick cancellation error
# this layout avoids) and zeroing the compensation lanes, which is why
# 2-lane and 3-lane measured bit-identically wrong (27.6347/27.6346)
# while the STAGED pipeline (eager aug_pads) was parity-clean. Fixed by
# the optimization_barriers in aug_pads (docstring there); pinned by
# tests/test_pallas.py::test_aug_pads_survives_jit.
# ZERO padding rows/columns give d2 = 0 -> kb = 1: garbage
# annihilated by the paired zero vector entries, the same caller
# contract as the plain layout's exp(-norm) garbage. bf16-only — the
# f32 paths have no rounding to compensate and keep the plain layout.
AUG_LANES = 6


def aug_d_pad_of(d: int) -> int:
    return d_pad_of(d + AUG_LANES)


def _kb_tile_aug(a, bt, dtype):
    """(tile_p, tile_n) kernel tile from AUGMENTED feature tiles."""
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    d2 = jnp.maximum(
        jnp.dot(a, bt, preferred_element_type=jnp.float32, precision=prec),
        0.0)
    if dtype == jnp.bfloat16:
        return jnp.exp(-d2.astype(jnp.bfloat16))
    return jnp.exp(-d2)


def _tile(a, bt, dtype, aug: bool):
    return _kb_tile_aug(a, bt, dtype) if aug else _kb_tile(a, bt, dtype)


def aug_pads(feats_a, feats_n, n_pad: int):
    """Augmented bf16 layouts: ((p, d) features, (n, d) features, n_pad)
    -> (fa_aug (p_pad, dp), f_t_aug (dp, n_pad)). The ft rows [0:d] are
    the SAME bf16 features the plain layout carries — ft_aug is a strict
    superset, so kernels that keep the plain precision class (finish/
    colstats, whose fa lanes beyond d are zero) can consume it too.

    EVERY bf16 rounding below sits behind ``lax.optimization_barrier``.
    XLA:TPU's excess-precision simplifier elides f32->bf16->f32
    round-trips inside a fused program (measured on this box: a jitted
    aug_pads returned na lanes [35.25, 0, 0] where eager computes
    [35.5, -0.1235, 0.00022]) — which (a) computes na/nb from the
    UNROUNDED features while the GEMM multiplies the rounded ones (an
    absolute d2 error ~|2 f df| ~ 0.2 at NLM norm magnitudes — exactly
    the GEMM-trick cancellation class this layout exists to avoid), and
    (b) collapses the compensated split lanes to zero. End-to-end that
    measured -0.33 dB per aug kernel / -0.67 dB for both on the 1 MP
    matvec route (aug_bisect, r5) while the STAGED pipeline — eager
    aug_pads, op-by-op dispatch — was parity-clean: the regression only
    existed inside the fused jit. The barriers are free: they pin tiny
    per-vector converts, and the operands feed an opaque custom call
    anyway."""
    p, d = feats_a.shape
    n = feats_n.shape[0]
    dp = aug_d_pad_of(d)
    _, p_pad = p_tiling(p)
    barrier = jax.lax.optimization_barrier
    fr_a = barrier(feats_a.astype(jnp.bfloat16))
    fr_n = barrier(feats_n.astype(jnp.bfloat16))
    na = jnp.sum(fr_a.astype(jnp.float32) ** 2, axis=1)
    nb = jnp.sum(fr_n.astype(jnp.float32) ** 2, axis=1)

    def split3(x):
        hi = barrier(x.astype(jnp.bfloat16))
        r1 = x - hi.astype(jnp.float32)
        mid = barrier(r1.astype(jnp.bfloat16))
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, mid, lo

    na_hi, na_mid, na_lo = split3(na)
    nb_hi, nb_mid, nb_lo = split3(nb)
    fa = (jnp.zeros((p_pad, dp), jnp.bfloat16)
          .at[:p, :d].set(-2.0 * fr_a)          # exact: bf16 * 2, negated
          .at[:p, d].set(na_hi).at[:p, d + 1].set(na_mid)
          .at[:p, d + 2].set(na_lo)
          .at[:p, d + 3].set(1.0).at[:p, d + 4].set(1.0)
          .at[:p, d + 5].set(1.0))
    ft = (jnp.zeros((dp, n_pad), jnp.bfloat16)
          .at[:d, :n].set(fr_n.T)
          .at[d, :n].set(1.0).at[d + 1, :n].set(1.0).at[d + 2, :n].set(1.0)
          .at[d + 3, :n].set(nb_hi).at[d + 4, :n].set(nb_mid)
          .at[d + 5, :n].set(nb_lo))
    return fa, ft


def _matvec_kernel(a_ref, b_ref, v_ref, out_ref, *, aug=False):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    kb = _tile(a_ref[:], b_ref[:], a_ref.dtype, aug)
    # VPU consume (f32 multiply + lane reduction): the rank-1 MXU dot
    # kb @ v pays for 128 output columns to produce one — measured 1.11x
    # at the 8 MP shape (benchmarks/ab_matvec_consume.py), and the f32
    # product is slightly MORE precise than the bf16-input dot it
    # replaces (6.5e-8 max rel diff). The rmatvec kernel keeps its MXU
    # consume: the (1, p) @ (p, tn) orientation measured FASTER than the
    # sublane-reduction VPU variant (0.84x) — see the same A/B.
    prod = kb.astype(jnp.float32) * v_ref[:].astype(jnp.float32)
    out_ref[:] += jnp.sum(prod, axis=1, keepdims=True)


def _rmatvec_kernel(a_ref, b_ref, t_ref, out_ref, *, aug=False):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    kb = _tile(a_ref[:], b_ref[:], a_ref.dtype, aug)
    prec = "default" if kb.dtype == jnp.bfloat16 else "highest"
    out_ref[:] += jnp.dot(t_ref[:].astype(kb.dtype), kb,
                          preferred_element_type=jnp.float32,
                          precision=prec)


def _kb_emit_kernel(a_ref, b_ref, c_ref, out_ref, *, aug=False):
    kb = _tile(a_ref[:], b_ref[:], a_ref.dtype, aug)
    out_ref[:] = kb * c_ref[:].astype(kb.dtype)


# Emitter tiling: unlike the matvec kernels (tiny outputs, kb lives only on
# the stack), the emitter materializes kb — the f32 distance intermediate
# (tp x tn x 4B) plus the double-buffered output tile must fit the 16 MB
# scoped-VMEM limit, so tiles are capped at (2048, 512) (measured OOM at
# (4096, 1024): 17.5 MB stack).
EMIT_TN = 512


def _emit_tile_p(p_pad: int) -> int:
    for cand in (2048, 1024, 512):
        if p_pad % cand == 0:
            return cand
    raise ValueError(f"p_pad={p_pad} not 512-aligned")


@functools.partial(jax.jit, static_argnames=("interpret", "aug"))
def kb_strip_pallas(feats_a_pad, f_t_block, cols, interpret: bool | None = None,
                    aug: bool = False):
    """Column-scaled kernel strip block, emitted fused: (p_pad, D), (D, S),
    (S,) -> exp(-d2) * cols (p_pad, S) in the feature dtype.

    One fused dist-GEMM -> exp -> scale per VMEM tile: the f32 distance
    intermediate and the unscaled kb never exist in HBM (the XLA version
    round-trips both, ~0.6 s of the 2.18 s gram pass at 8 MP —
    benchmarks/results/profile.jsonl). The emitted block feeds a plain XLA
    GEMM (gram) or matmul chain; emitting beats full fusion here because a
    fully-fused gram must recompute kb tiles p/tile_p times per output
    row-block, multiplying the exp cost."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_pad = feats_a_pad.shape[0]
    s = f_t_block.shape[1]
    dp = _check_dp(feats_a_pad, f_t_block)
    dtype = feats_a_pad.dtype
    tp = _emit_tile_p(p_pad)
    tn = EMIT_TN
    if s % tn != 0:
        # a floor-divided grid would leave tail columns UNINITIALIZED
        # (colstats_v_pallas guard note — same hazard class)
        raise ValueError(f"kb_strip_pallas needs width % {tn} == 0, got {s}")
    grid = (p_pad // tp, s // tn)
    return pl.pallas_call(
        functools.partial(_kb_emit_kernel, aug=aug),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, s), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * s * (dp + 1),
            bytes_accessed=(p_pad + s) * dp * dtype.itemsize
            + p_pad * s * dtype.itemsize,
            transcendentals=p_pad * s,
        ),
        interpret=interpret,
    )(feats_a_pad, f_t_block, cols.astype(dtype).reshape(1, s))


@functools.partial(jax.jit, static_argnames=("block", "interpret", "aug"))
def gram_pallas(feats_a_pad, f_t, cols, block: int,
                interpret: bool | None = None, aug: bool = False):
    """(D_r-free) gram sum_j (c_j k_j)(c_j k_j)^T -> (p_pad, p_pad) f32,
    scanning emitted kb superblocks. Caller applies the row scale."""
    dtype = feats_a_pad.dtype
    p_pad = feats_a_pad.shape[0]
    n_pad = f_t.shape[1]
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    if n_pad % block != 0:
        # the scan covers n_pad // block superblocks; a remainder would
        # silently drop the tail columns' gram contribution
        raise ValueError(
            f"gram_pallas needs n_pad % block == 0, got {n_pad} % {block}")

    def body(acc, i):
        bt = jax.lax.dynamic_slice_in_dim(f_t, i * block, block, axis=1)
        cb = jax.lax.dynamic_slice_in_dim(cols, i * block, block, axis=0)
        kb = kb_strip_pallas(feats_a_pad, bt, cb, interpret=interpret,
                             aug=aug)
        return acc + jnp.dot(kb, kb.T, preferred_element_type=jnp.float32,
                             precision=prec), None

    acc0 = jnp.zeros((p_pad, p_pad), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_pad // block))
    return acc


@functools.partial(jax.jit, static_argnames=("interpret", "vma", "aug"))
def matvec_pallas(feats_a_pad, feats_t, v, interpret: bool | None = None,
                  vma: tuple | None = None, aug: bool = False):
    """K @ v: ((p_pad, D), (D, n_pad), (n_pad,)) -> (p_pad,) f32.

    ``vma``: mesh axes the output varies over — required when called
    inside a ``shard_map`` with ``check_vma=True`` (pallas_call cannot
    infer it)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_pad = feats_a_pad.shape[0]
    n_pad = feats_t.shape[1]
    dp = _check_dp(feats_a_pad, feats_t)
    dtype = feats_a_pad.dtype
    tp = _tile_p_of(p_pad)
    if n_pad % _tile_n(dtype) != 0:
        raise ValueError(
            f"matvec_pallas needs n_pad % {_tile_n(dtype)} == 0 (tile of "
            f"{dtype}), got {n_pad} — pad with _tile_n, not a fixed width")
    tn = (_pick_tn(n_pad, dtype, MATVEC_TN_CAP)
          if dtype == jnp.bfloat16 else _tile_n(dtype))
    grid = (p_pad // tp, n_pad // tn)
    out_shape = (jax.ShapeDtypeStruct((p_pad, 1), jnp.float32, vma=frozenset(vma))
                 if vma else jax.ShapeDtypeStruct((p_pad, 1), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_matvec_kernel, aug=aug),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tp, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * (dp + 1),
            bytes_accessed=(p_pad + n_pad) * dp * dtype.itemsize
            + 4 * (p_pad + n_pad),
            transcendentals=p_pad * n_pad,
        ),
        compiler_params=_cparams(),
        interpret=interpret,
    )(feats_a_pad, feats_t, v.astype(dtype).reshape(1, n_pad))
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "vma", "aug"))
def rmatvec_pallas(feats_a_pad, feats_t, t, interpret: bool | None = None,
                   vma: tuple | None = None, aug: bool = False):
    """K^T @ t: ((p_pad, D), (D, n_pad), (p_pad,)) -> (n_pad,) f32.

    ``vma``: see matvec_pallas."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_pad = feats_a_pad.shape[0]
    n_pad = feats_t.shape[1]
    dp = _check_dp(feats_a_pad, feats_t)
    dtype = feats_a_pad.dtype
    tp = _tile_p_of(p_pad)
    if n_pad % _tile_n(dtype) != 0:
        raise ValueError(
            f"rmatvec_pallas needs n_pad % {_tile_n(dtype)} == 0 (tile of "
            f"{dtype}), got {n_pad} — pad with _tile_n, not a fixed width")
    tn = (_pick_tn(n_pad, dtype, MATVEC_TN_CAP)
          if dtype == jnp.bfloat16 else _tile_n(dtype))
    grid = (n_pad // tn, p_pad // tp)
    out_shape = (jax.ShapeDtypeStruct((1, n_pad), jnp.float32, vma=frozenset(vma))
                 if vma else jax.ShapeDtypeStruct((1, n_pad), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_rmatvec_kernel, aug=aug),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, dp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * (dp + 1),
            bytes_accessed=(p_pad + n_pad) * dp * dtype.itemsize
            + 4 * (p_pad + n_pad),
            transcendentals=p_pad * n_pad,
        ),
        compiler_params=_cparams(),
        interpret=interpret,
    )(feats_a_pad, feats_t, t.astype(dtype).reshape(1, p_pad))
    return out[0]


M_PAD = 128


def m_pad_of(m: int) -> int:
    """Eigvec-axis pad for the fused-finish V buffer. A 64-wide pad for
    m <= 64 (half the V-GEMM FLOPs + half the V traffic) is a MEASURED
    NEGATIVE: 0.331 s (tn=256) / 0.229 s (tn=512) vs 0.243 / 0.185 for
    the 128 pad at 8 MP (profile.jsonl finish_m64* rows) — the 64-lane
    minor dim halves MXU lane utilization, which costs more than the
    saved FLOPs. The kernel still accepts 64-wide ``gr`` for
    re-measurement on future hardware; production always pads to 128."""
    return M_PAD


# KEEP IN SYNC with models/streaming._EPS — the fused-finish kernels
# inline the Sinkhorn scale updates that models/streaming.py otherwise
# computes between sweeps.
FINISH_EPS = 1e-30


def _require_whole_p(p_pad: int, name: str) -> None:
    """The fused-finish kernels keep the WHOLE sample block resident so a
    kernel tile can serve two consumers without a p-tile accumulation
    phase (a split-p grid would have to recompute kb per p-tile after the
    full-p contraction lands, doubling the exp cost — the very thing the
    fusion removes). Callers gate on this and fall back to the unfused
    sweeps."""
    if p_pad > MAX_TILE_P:
        raise ValueError(
            f"{name} needs p_pad <= {MAX_TILE_P} (whole-p tile), got "
            f"{p_pad} — use the unfused sweeps for larger p")


def _ext2_matvec_kernel(a_ref, b_ref, t2_ref, bm_ref, u_ref, s_ref,
                        *, aug=False):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    dtype = a_ref.dtype
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    kb = _tile(a_ref[:], b_ref[:], dtype, aug)            # (p, tn)
    kbt = jnp.dot(t2_ref[:], kb, preferred_element_type=jnp.float32,
                  precision=prec)                          # (2, tn) f32
    prod = jnp.maximum(kbt[0:1, :] * kbt[1:2, :], FINISH_EPS)
    s = bm_ref[:] / jnp.sqrt(prod)                         # (1, tn) f32
    s_ref[:] = s
    # VPU consume, like _matvec_kernel. Historical note: under Mosaic's
    # default 16 MB scoped-VMEM limit this variant FAILED to compile at
    # the (4096, 1024) tile (f32 product temp 16.25M) and the kernel kept
    # a rank-1 MXU dot; with VMEM_LIMIT_BYTES=64MB it fits and measures
    # 1.175x the MXU consume at tn=1024 (ab_matvec_consume.jsonl ext2
    # rows, 8 MP shape) — which also moves the optimal tile back to the
    # 1024 quantum (EXT2_TN_CAP note above).
    u_ref[:] += jnp.sum(kb.astype(jnp.float32) * s, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "tn", "aug"))
def ext2_matvec_pallas(feats_a_pad, f_t, t2, b_mask,
                       interpret: bool | None = None,
                       tn: int | None = None, aug: bool = False):
    """Fused Sinkhorn extension + polish matvec — ONE full-resolution
    sweep where the unfused schedule takes two:

        kbt_j = k_j^T [t_r, t_c]                      (the rmatvec2 sweep)
        s_j   = bm_j / sqrt(max(kbt_r * kbt_c, eps))  (pre-polish B scales)
        u    += k_j s_j                               (the polish matvec)

    ((p_pad, D), (D, n_pad), (2, p_pad) f32, (n_pad,) f32) ->
    (u (p_pad,) f32, s (n_pad,) f32). The kernel tile kb serves BOTH dots
    from VMEM — on the XLA path a shared kb has two consumers and gets
    materialized to HBM, which is why the unfused schedule won there
    (models/streaming.py polish note, measured 0.80 vs 0.68 s at 8 MP);
    here the fusion is structural. Matvec precision class (_kb_tile:
    bf16-exp when dtype is bf16), matching the strip matvecs this
    replaces. b_mask must be 0 on A columns and padding (makes s exact
    zero there, so they vanish from u, exactly as in the unfused path)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_pad = feats_a_pad.shape[0]
    n_pad = f_t.shape[1]
    dp = _check_dp(feats_a_pad, f_t)
    dtype = feats_a_pad.dtype
    _require_whole_p(p_pad, "ext2_matvec_pallas")
    if tn is None:
        tn = (_pick_tn(n_pad, dtype, EXT2_TN_CAP)
              if dtype == jnp.bfloat16 else _tile_n(dtype))
    if n_pad % tn != 0:
        raise ValueError(
            f"ext2_matvec_pallas needs n_pad % {tn} == 0 (tile of {dtype}),"
            f" got {n_pad} — pad with _tile_n, not a fixed width")
    grid = (n_pad // tn,)
    u, s = pl.pallas_call(
        functools.partial(_ext2_matvec_kernel, aug=aug),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pad, dp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, p_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_pad, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * (dp + 3),
            bytes_accessed=(p_pad + n_pad) * dp * dtype.itemsize
            + 4 * (3 * p_pad + 2 * n_pad),
            transcendentals=p_pad * n_pad,
        ),
        compiler_params=_cparams(),
        interpret=interpret,
    )(feats_a_pad, f_t, t2.astype(dtype), b_mask.astype(jnp.float32)
      .reshape(1, n_pad))
    return u[:, 0], s[0]


# fused-finish column tile, f32 fallback. bf16 resolves via _pick_tn up
# to FIN_TN_CAP=2048 under the raised VMEM limit (vmem_tiles.jsonl:
# 0.1416 s at 512 -> 0.1349 at 2048 at 8 MP; 4096 regresses). f32 keeps
# 256: its (4096, 512) cross/d2 stack measured 17.92 MB scoped VMEM in
# the matvec kernels — compiles under the raised limit but is unswept
# on-chip, and the f32 paths are non-headline.
FIN_TN = 256


def _fin_tn(n_pad: int, dtype) -> int:
    if dtype == jnp.bfloat16:
        # 512 is the bf16 floor (the old measured optimum under the 16 MB
        # limit); n_pad is padded to the 1024 quantum so _pick_tn >= 1024
        return _pick_tn(n_pad, dtype, FIN_TN_CAP)
    return FIN_TN


def _finish_colstats_kernel(a_ref, b_ref, t_ref, sp_ref, bm_ref, g_ref,
                            y_ref, na_ref, nb_ref,
                            v_ref, ns_ref, co_ref, s_ref):
    j = pl.program_id(0)
    dtype = a_ref.dtype
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    # colstats precision class (see _colstats_kernel): bf16 GEMM inputs
    # only; norms arrive precomputed in f32 and the exp runs f32 — this
    # pass feeds the output coefficients directly.
    cross = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
    d2 = jnp.maximum(na_ref[:] + nb_ref[:] - 2.0 * cross, 0.0)
    kb = jnp.exp(-d2).astype(dtype)                        # (p, tn)
    ks = jnp.dot(t_ref[:], kb, preferred_element_type=jnp.float32,
                 precision=prec)                           # (1, tn) f32
    s_new = jnp.sqrt(sp_ref[:] / jnp.maximum(ks, FINISH_EPS)) * bm_ref[:]
    s_ref[:] = s_new
    vb = jnp.dot((kb * s_new.astype(dtype)).T, g_ref[:].astype(dtype),
                 preferred_element_type=jnp.float32, precision=prec)
    v_ref[:] = vb                                          # (tn, M_PAD)
    ns = jnp.sum(vb * vb, axis=0, keepdims=True)
    co = jnp.dot(y_ref[:], vb, preferred_element_type=jnp.float32,
                 precision="highest")

    @pl.when(j == 0)
    def _():
        ns_ref[:] = ns
        co_ref[:] = co

    @pl.when(j > 0)
    def _():
        ns_ref[:] += ns
        co_ref[:] += co


@functools.partial(jax.jit, static_argnames=("interpret", "tn"))
def finish_colstats_pallas(feats_a_pad, f_t, t, s_pre, b_mask, gr, y,
                           na, nb, interpret: bool | None = None,
                           tn: int | None = None):
    """Fused polish rmatvec + scale update + colstats + V — ONE sweep
    where the unfused schedule takes two:

        ks_j  = k_j^T t                                (the polish rmatvec)
        s_j   = sqrt(s_pre_j / max(ks_j, eps)) * bm_j  (post-polish scale)
        V_j   = (s_j k_j)^T gr;  norms += V_j^2;  coeffs += y_j V_j

    ((p_pad, D), (D, n_pad), (p_pad,), (n_pad,) f32, (n_pad,) f32,
    (p_pad, m_pad) f32, (n_pad,) f32, (p_pad,) f32, (n_pad,) f32) ->
    (V (n_pad, m_pad) f32, norms (m_pad,), coeffs (m_pad,), s (n_pad,)).

    ``gr`` carries the POST-polish row scale folded in, m zero-padded to
    m_pad_of(m) — 64 or 128, inferred from gr.shape[1]; zero columns stay
    exact zeros. ``t`` is the polish p-vector (s_a_pre + K_AA^{-1} u);
    ``s_pre``/``b_mask`` are 0 on A columns and padding, so those columns
    produce s_j = 0 and vanish from V/norms/coeffs (A rows are handled on
    the p side, as in the unfused path). ``tn`` overrides the column-tile
    width (benchmarks only; None = _fin_tn(n_pad, dtype))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_pad = feats_a_pad.shape[0]
    n_pad = f_t.shape[1]
    dp = _check_dp(feats_a_pad, f_t)
    dtype = feats_a_pad.dtype
    _require_whole_p(p_pad, "finish_colstats_pallas")
    m_pad = gr.shape[1]
    if m_pad not in (64, M_PAD):
        raise ValueError(
            f"finish_colstats_pallas needs gr padded to 64 or {M_PAD} "
            f"columns (m_pad_of), got {m_pad}")
    if tn is None:
        tn = _fin_tn(n_pad, dtype)
    if n_pad % tn != 0:
        raise ValueError(
            f"finish_colstats_pallas needs n_pad % {tn} == 0, got {n_pad} "
            f"(both _tile_n paddings are multiples of {tn})")
    grid = (n_pad // tn,)
    v, ns, co, s = pl.pallas_call(
        _finish_colstats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pad, dp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, m_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, m_pad), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * (dp + m_pad + 1),
            bytes_accessed=(p_pad + n_pad) * dp * dtype.itemsize
            + 4 * n_pad * (m_pad + 4) + 4 * p_pad * (m_pad + 2),
            transcendentals=p_pad * n_pad,
        ),
        compiler_params=_cparams(),
        interpret=interpret,
    )(feats_a_pad, f_t, t.astype(dtype).reshape(1, p_pad),
      s_pre.astype(jnp.float32).reshape(1, n_pad),
      b_mask.astype(jnp.float32).reshape(1, n_pad), gr,
      y.astype(jnp.float32).reshape(1, n_pad),
      na.astype(jnp.float32).reshape(p_pad, 1),
      nb.astype(jnp.float32).reshape(1, n_pad))
    return v, ns[0], co[0], s[0]


def _colstats_kernel(a_ref, b_ref, c_ref, g_ref, y_ref, na_ref, nb_ref,
                     v_ref, ns_ref, co_ref, *, np_tiles):
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        v_ref[:] = jnp.zeros_like(v_ref)

    # precision-faithful twin of ops/affinity.affinity_strip: the cross
    # GEMM runs on the (possibly bf16) feature tiles, but the norms arrive
    # PRECOMPUTED in f32 and the exp runs f32. (_kb_tile's all-bf16 tile
    # is fine for the Sinkhorn matvecs/gram, but colstats feeds the OUTPUT
    # coefficients directly: the all-bf16 variant measured 0.157 dB at
    # 8 MP — over the gate — vs 0.03 dB for this one.) Zero-padded
    # feature rows/cols produce garbage kb entries that are annihilated by
    # the zero gr rows / col scales, exactly as in the XLA twin.
    dtype = a_ref.dtype
    prec = "default" if dtype == jnp.bfloat16 else "highest"
    cross = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
    d2 = jnp.maximum(na_ref[:] + nb_ref[:] - 2.0 * cross, 0.0)
    kb = jnp.exp(-d2).astype(dtype) * c_ref[:].astype(dtype)
    v_ref[:] += jnp.dot(kb.T, g_ref[:].astype(dtype),
                        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(i == np_tiles - 1)
    def _():
        vb = v_ref[:]                                  # (tn, M_PAD) f32
        ns = jnp.sum(vb * vb, axis=0, keepdims=True)
        co = jnp.dot(y_ref[:], vb, preferred_element_type=jnp.float32,
                     precision="highest")              # (1, M_PAD)

        @pl.when(j == 0)
        def _():
            ns_ref[:] = ns
            co_ref[:] = co

        @pl.when(j > 0)
        def _():
            ns_ref[:] += ns
            co_ref[:] += co


@functools.partial(jax.jit, static_argnames=("interpret",))
def colstats_v_pallas(feats_a_pad, f_t, gr, y, cols, na, nb,
                      interpret: bool | None = None):
    """Fused colstats+V pass: ((p_pad, D), (D, n_pad), (p_pad, M_PAD) f32,
    (n_pad,) f32, (n_pad,), (p_pad,) f32, (n_pad,) f32) ->
    (V (n_pad, M_PAD) f32, norms (M_PAD,), coeffs (M_PAD,)).

    V_j = (c_j k_j)^T gr per column tile with the kernel tile living only
    in VMEM (distance-GEMM -> exp -> scale -> second GEMM fused), plus the
    column sq-norms and V^T y folded in the same pass — the XLA scan twin
    is ops/streaming.rmatmat_colstats_v. Reuses the SAME (possibly bf16)
    feature tilings as the matvec kernels; ``na``/``nb`` are the f32
    squared feature norms so the distance follows affinity_strip's
    precision policy exactly (bf16 GEMM inputs only; norms + exp in f32).
    ``gr`` carries the row scale folded in and m zero-padded to M_PAD
    columns (zero columns stay exactly zero through both GEMMs). A/B vs
    the XLA scan at 8 MP: benchmarks/colstats_ab.py.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_pad = feats_a_pad.shape[0]
    n_pad = f_t.shape[1]
    dp = _check_dp(feats_a_pad, f_t)
    dtype = feats_a_pad.dtype
    tp = _emit_tile_p(p_pad)
    tn = EMIT_TN
    if n_pad % tn != 0:
        # the floor-divided grid would silently DROP the tail columns
        # (zeroed V rows, missing norm/coeff contributions) — e.g. the
        # f32 matvec tiling pads n to 256, not this kernel's 512
        raise ValueError(
            f"colstats_v_pallas needs n_pad % {tn} == 0, got {n_pad} "
            f"(pad the feature tiling to EMIT_TN, not the matvec tile)")
    np_tiles = p_pad // tp
    grid = (n_pad // tn, np_tiles)
    kernel = functools.partial(_colstats_kernel, np_tiles=np_tiles)
    v, ns, co = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tp, dp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, M_PAD), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, M_PAD), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PAD), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M_PAD), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, M_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, M_PAD), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * (dp + M_PAD),
            bytes_accessed=(p_pad + n_pad) * dp * dtype.itemsize
            + 4 * n_pad * (M_PAD + 3) + 4 * p_pad * (M_PAD + 1),
            transcendentals=p_pad * n_pad,
        ),
        interpret=interpret,
    )(feats_a_pad, f_t, cols.astype(dtype).reshape(1, n_pad), gr,
      y.astype(jnp.float32).reshape(1, n_pad),
      na.astype(jnp.float32).reshape(p_pad, 1),
      nb.astype(jnp.float32).reshape(1, n_pad))
    return v, ns[0], co[0]


# ---------------------------------------------------------------------------
# strip_cache fused sweeps (VERDICT r4 #2): kernels that CONSUME a
# materialized (p_pad, n_pad) strip instead of recomputing kb tiles. The
# strip_cache pipeline is HBM-bound by design; its unfused XLA schedule
# reads the full strip EIGHT times per image (kbt, polish matvec, polish
# rmatvec, 2x2 sketch-sandwich passes, colstats). These kernels give each
# strip tile two-or-three consumers from VMEM, cutting the sweeps to four
# (ext2-strip, sandwich+spost, sandwich, colstats) — the same fusion
# shapes as the recompute fused finish, minus the recompute.
#
# Caller contract: strip rows padded to p_pad with EXACT-ZERO rows (the
# emitter poisons the padded feature rows so exp underflows — see
# models/streaming._strip_ctx), columns n_pad with exact-zero columns;
# n_pad % tn == 0. The strip dtype sets the GEMM input precision
# (bf16 strip -> native bf16 MXU passes, f32 accumulate — the same class
# as models/streaming._strip_dot).
# ---------------------------------------------------------------------------

STRIP_TN_CAP = 1024


def _strip_prec(dtype):
    return "default" if dtype == jnp.bfloat16 else "highest"


def _strip_ext2_kernel(k_ref, t2_ref, bm_ref, u_ref, s_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    kb = k_ref[:]                                      # (p_pad, tn) strip tile
    kbt = jnp.dot(t2_ref[:], kb, preferred_element_type=jnp.float32,
                  precision=_strip_prec(kb.dtype))     # (2, tn) f32
    prod = jnp.maximum(kbt[0:1, :] * kbt[1:2, :], FINISH_EPS)
    s = bm_ref[:] / jnp.sqrt(prod)
    s_ref[:] = s
    u_ref[:] += jnp.sum(kb.astype(jnp.float32) * s, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "tn"))
def strip_ext2_pallas(strip, t2, b_mask, interpret: bool | None = None,
                      tn: int | None = None):
    """Fused Sinkhorn extension + polish matvec on a materialized strip —
    ONE strip sweep where the XLA schedule takes two (same math as
    ext2_matvec_pallas, tile source swapped from recompute to HBM):

        kbt_j = K_j^T [t_r, t_c];  s_j = bm_j / sqrt(max(kbt_r kbt_c, eps))
        u    += K_j s_j

    ((p_pad, n_pad) strip, (2, p_pad) f32, (n_pad,) f32) ->
    (u (p_pad,) f32, s (n_pad,) f32)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_pad, n_pad = strip.shape
    dtype = strip.dtype
    if tn is None:
        tn = _pick_tn(n_pad, dtype, STRIP_TN_CAP)
    if n_pad % tn != 0:
        raise ValueError(f"strip_ext2_pallas needs n_pad % {tn} == 0, "
                         f"got {n_pad}")
    grid = (n_pad // tn,)
    u, s = pl.pallas_call(
        _strip_ext2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_pad, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, p_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_pad, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * 3,
            bytes_accessed=p_pad * n_pad * dtype.itemsize
            + 4 * (3 * p_pad + 2 * n_pad),
            transcendentals=0,
        ),
        compiler_params=_cparams(),
        interpret=interpret,
    )(strip, t2.astype(dtype), b_mask.astype(jnp.float32).reshape(1, n_pad))
    return u[:, 0], s[0]


def _strip_sandwich_spost_kernel(k_ref, ta_ref, t_ref, sp_ref, bm_ref,
                                 u_ref, s_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    kb = k_ref[:]                                      # (p_pad, tn)
    dtype = kb.dtype
    prec = _strip_prec(dtype)
    # polish rmatvec at this tile -> post-polish column scales
    ks = jnp.dot(t_ref[:], kb, preferred_element_type=jnp.float32,
                 precision=prec)                       # (1, tn) f32
    s_post = jnp.sqrt(sp_ref[:] / jnp.maximum(ks, FINISH_EPS)) * bm_ref[:]
    s_ref[:] = s_post
    # sketch sandwich at the SAME tile: u += K_j (s_post_j^2 * (K_j^T ta))
    w = jax.lax.dot_general(kb, ta_ref[:], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)            # (tn, k) f32
    ws = (w * (s_post * s_post).reshape(-1, 1)).astype(dtype)
    u_ref[:] += jnp.dot(kb, ws, preferred_element_type=jnp.float32,
                        precision=prec)


def _strip_sandwich_kernel(k_ref, ta_ref, s2_ref, u_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    kb = k_ref[:]
    prec = _strip_prec(kb.dtype)
    w = jax.lax.dot_general(kb, ta_ref[:], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    ws = (w * s2_ref[:].reshape(-1, 1)).astype(kb.dtype)
    u_ref[:] += jnp.dot(kb, ws, preferred_element_type=jnp.float32,
                        precision=prec)


def _strip_sandwich_specs(p_pad, n_pad, kp, tn, extra_in=()):
    in_specs = [
        pl.BlockSpec((p_pad, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((p_pad, kp), lambda j: (0, 0), memory_space=pltpu.VMEM),
    ] + list(extra_in)
    return in_specs


@functools.partial(jax.jit, static_argnames=("interpret", "tn"))
def strip_sandwich_spost_pallas(strip, ta, t, s_pre, b_mask,
                                interpret: bool | None = None,
                                tn: int | None = None):
    """Fused polish rmatvec + post-polish scales + first sketch-sandwich
    pass — ONE strip sweep where the XLA schedule takes three:

        ks_j     = K_j^T t            (the polish rmatvec)
        s_post_j = sqrt(s_pre_j / max(ks_j, eps)) * bm_j
        u       += K_j (s_post_j^2 * (K_j^T ta))   (W_AB W_AB^T ta)

    ((p_pad, n_pad) strip, (p_pad, kp) f32 sketch operand [A-scales folded
    by the caller], (p_pad,) f32 polish vector, (n_pad,) f32 pre-polish
    scales [0 on A/pad], (n_pad,) f32 B mask) ->
    (u (p_pad, kp) f32, s_post (n_pad,) f32 [0 on A/pad via bm])."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_pad, n_pad = strip.shape
    kp = ta.shape[1]
    dtype = strip.dtype
    if ta.shape[0] != p_pad:
        raise ValueError(f"ta rows {ta.shape[0]} != strip rows {p_pad}")
    if kp % 128 != 0:
        raise ValueError(f"sketch width {kp} must be 128-padded")
    if tn is None:
        tn = _pick_tn(n_pad, dtype, STRIP_TN_CAP)
    if n_pad % tn != 0:
        raise ValueError(f"strip_sandwich_spost_pallas needs n_pad % {tn} "
                         f"== 0, got {n_pad}")
    grid = (n_pad // tn,)
    u, s = pl.pallas_call(
        _strip_sandwich_spost_kernel,
        grid=grid,
        in_specs=_strip_sandwich_specs(p_pad, n_pad, kp, tn, extra_in=(
            pl.BlockSpec((1, p_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        )),
        out_specs=[
            pl.BlockSpec((p_pad, kp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, kp), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * (2 * kp + 1),
            bytes_accessed=p_pad * n_pad * dtype.itemsize
            + 4 * (p_pad * (2 * kp + 1) + 3 * n_pad),
            transcendentals=0,
        ),
        compiler_params=_cparams(),
        interpret=interpret,
    )(strip, ta.astype(dtype), t.astype(dtype).reshape(1, p_pad),
      s_pre.astype(jnp.float32).reshape(1, n_pad),
      b_mask.astype(jnp.float32).reshape(1, n_pad))
    return u, s[0]


@functools.partial(jax.jit, static_argnames=("interpret", "tn"))
def strip_sandwich_pallas(strip, ta, s2, interpret: bool | None = None,
                          tn: int | None = None):
    """One-sweep sketch sandwich on a materialized strip:
    u = sum_j K_j (s2_j * (K_j^T ta)) — each strip tile read ONCE and
    consumed by both dots from VMEM (the XLA schedule reads the strip
    twice: rmatmat then matmat). ((p_pad, n_pad), (p_pad, kp) f32,
    (n_pad,) f32 squared column scales [0 on A/pad]) -> u (p_pad, kp)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    p_pad, n_pad = strip.shape
    kp = ta.shape[1]
    dtype = strip.dtype
    if ta.shape[0] != p_pad:
        raise ValueError(f"ta rows {ta.shape[0]} != strip rows {p_pad}")
    if kp % 128 != 0:
        raise ValueError(f"sketch width {kp} must be 128-padded")
    if tn is None:
        tn = _pick_tn(n_pad, dtype, STRIP_TN_CAP)
    if n_pad % tn != 0:
        raise ValueError(f"strip_sandwich_pallas needs n_pad % {tn} == 0, "
                         f"got {n_pad}")
    grid = (n_pad // tn,)
    u = pl.pallas_call(
        _strip_sandwich_kernel,
        grid=grid,
        in_specs=_strip_sandwich_specs(p_pad, n_pad, kp, tn, extra_in=(
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        )),
        out_specs=pl.BlockSpec((p_pad, kp), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, kp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * n_pad * 2 * kp,
            bytes_accessed=p_pad * n_pad * dtype.itemsize
            + 4 * (2 * p_pad * kp + n_pad),
            transcendentals=0,
        ),
        compiler_params=_cparams(),
        interpret=interpret,
    )(strip, ta.astype(dtype),
      s2.astype(jnp.float32).reshape(1, n_pad))
    return u
