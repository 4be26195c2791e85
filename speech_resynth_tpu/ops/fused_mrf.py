"""Fused multi-receptive-field residual branch (HiFi-GAN) Pallas kernel.

The north-star vocoder kernel (BASELINE.json): one ResidualBlock branch —
three (dilated conv -> leaky-relu -> conv -> +residual) pairs of kernel size
k with dilations (1, 3, 5) — computed entirely in VMEM per time block.

Why XLA leaves performance here: HiFi-GAN's late stages have tiny channel
counts (64/32/16) at huge time lengths (40k-160k); in NWC layout the MXU's
128 lanes carry C_out and sit mostly idle, and each of the 6 convs round-trips
the full activation through HBM.  This kernel:

  * runs in (C, T) layout — lanes carry TIME (always 128-aligned), sublanes
    carry channels; each conv is ONE matmul over an in-VMEM im2col, so the
    MXU contraction dim is n_s*C (up to ~900) instead of a starved C;
  * optionally PHASE-FOLDS time into the matmul output rows ("block-Toeplitz"
    weights): with fold=P the input is relaid out as
    x_f[p*C + c, t] = x[c, t*P + p], and one matmul produces P output
    time-phases at once — (P*C, n_s*C) x (n_s*C, T/P) — so the MXU's
    128 output rows are filled (P*C = 128 at C=16, P=8) instead of C/128
    starved.  The padded-FLOP cost is n_s/K per conv (zeros where a weight
    block has no tap), bounded ~2.5-4x, against an 8x row-fill gain at C=16;
  * matmul operands in the caller's compute dtype (bf16 in production ->
    full-rate MXU; f32 in the interpret parity tests), f32 accumulation,
    residual chain carried in f32;
  * keeps the whole 6-conv chain in VMEM scratch — one HBM read of the input
    block (+halo) and one write of the output block;
  * fuses every leaky-relu and residual add.

fold=1 reduces exactly to the unfolded im2col kernel (the only offsets s
with a weight tap are s = tap*d - pad, i.e. the K taps).

A lax reference implementation (`mrf_branch_reference`, NWC) defines the
semantics (matches models/hifigan.py:ResidualBlock, i.e. the reference's
HifiGanResidualBlock torch graph).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1

# Per-channel-count phase fold for the vocoder MRF stages, chosen so the
# folded matmul fills the MXU's 128 output rows; measured in-context on v5e
# (PARITY.md fused-MRF roofline section).  C >= 128 never reaches the fused
# kernel (XLA wins by measurement); C = 64 folded 2x gains ~nothing in
# theory (2x rows vs ~2x padded FLOPs) — the table is what measurement kept.
MRF_FOLD_TABLE = {16: 8, 32: 4, 64: 2}

# Per-channel-count contraction packing ("im2col" | "taps" | "grouped"),
# measured the same in-context way (benchmarks/bench_fold_ab.py).  "im2col"
# copies n_s offset-shifted input slices into one big contraction; "taps"
# instead runs 2*fpad+1 dense (P*C, P*C) x (P*C, T) matmuls straight off the
# activation buffer — more padded FLOPs but ZERO im2col copies (the VPU cost
# that dominates the narrow stages once folding fills the output rows);
# "grouped" splits the folded matmul into MRF_GROUPS phase-group matmuls that
# each contract only the offset blocks their phases actually use (the folded
# weight is mostly structural zeros — only K of n_s blocks per phase row) —
# fewer padded FLOPs per group, at the cost of sub-128 output rows per matmul.
# Round-5 verdict on "grouped" (VERDICT r4 #4's last untried lever),
# measured twice on v5e 2026-08-20: (1) the sequential whole-vocoder A/B
# showed grouped 68-69 ms vs im2col fold3 98.65 ms — but fold3 ran first
# and a *previous-day* calibration had fold3 at 70.53 ms, so that 30% was
# cross-candidate tunnel drift, not the kernel; (2) the drift-immune
# interleaved A/B inside the FULL serving program (bench_fold_ab.py
# --serving, alternating trials, same process, PARITY.md round-5) measured
# grouped 1713.7x vs im2col 1717.4x compute_rtf — NEUTRAL.  The
# block-sparse contraction's padded-FLOP savings are exactly cancelled by
# its sub-128-row group matmuls; im2col keeps production mileage.  The
# grouped kernel + this gate stay for re-measurement on future hardware
# (bench_fold_ab.py now interleaves candidates so sequential drift cannot
# manufacture a winner again).
MRF_PACK_TABLE: dict = {}

# phase groups for "grouped" packing (must divide the fold)
MRF_GROUPS: int = 2

# Whole-stage fusion (all branches + mean in ONE kernel, _mrf_stage_kernel):
# shares the input HBM read / f32 conversion / edge masks across branches
# and writes only the divided sum.  In-context whole-vocoder A/B on v5e
# (benchmarks/bench_fold_ab.py, 2026-08-19): fold3+stage 70.56 ms vs
# per-branch fold3 70.53 ms — NEUTRAL, because the folded narrow stages are
# not HBM-bound (per-stage roofline, PARITY.md round 4); their residual cost
# is in-VMEM im2col copies and fold-padded matmul columns, which fusion
# cannot remove.  Ships OFF (per-branch path keeps production mileage); the
# kernel + this gate stay for re-measurement on future hardware.
MRF_STAGE_FUSION: bool = False


@contextlib.contextmanager
def mrf_stage_fusion(enabled: bool):
    """Force whole-stage fusion on/off while active — trace-time decision,
    same discipline as upsample_implementation (enter BEFORE jitting)."""
    global MRF_STAGE_FUSION
    prev, MRF_STAGE_FUSION = MRF_STAGE_FUSION, enabled
    try:
        yield
    finally:
        MRF_STAGE_FUSION = prev


def mrf_fold_for_channels(channels: int) -> int:
    return MRF_FOLD_TABLE.get(channels, 1)


def mrf_packing_for_channels(channels: int) -> str:
    return MRF_PACK_TABLE.get(channels, "im2col")


def branch_halo(kernel_size: int, dilations: Sequence[int]) -> int:
    """Per-side receptive-field growth of the 6-conv chain (real samples)."""
    h = 0
    for d in dilations:
        h += (kernel_size * d - d) // 2  # dilated conv pad
        h += (kernel_size - 1) // 2  # unit conv pad
    return h


def mrf_branch_reference(x, w1, b1, w2, b2, dilations: Tuple[int, ...], slope: float = LRELU_SLOPE):
    """(B, T, C) lax reference.  w1/w2: (n_pairs, K, C, C); b1/b2: (n_pairs, C)."""
    for j, d in enumerate(dilations):
        residual = x
        h = jnp.where(x > 0, x, x * slope)
        h = jax.lax.conv_general_dilated(
            h, w1[j], (1,), "SAME", rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC")
        ) + b1[j]
        h = jnp.where(h > 0, h, h * slope)
        h = jax.lax.conv_general_dilated(
            h, w2[j], (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        ) + b2[j]
        x = h + residual
    return x


# ---------------------------------------------------------------------------
# phase folding: (B, T, C) <-> (B, P*C, ceil(T/P)) with x_f[p*C+c, t] = x[t*P+p, c]
# ---------------------------------------------------------------------------


def fold_time(x: jax.Array, fold: int) -> jax.Array:
    """(B, T, C) NWC -> folded (B, fold*C, ceil(T/fold)); zero-padded tail."""
    B, T, C = x.shape
    t_f = -(-T // fold)
    x = jnp.pad(x, ((0, 0), (0, t_f * fold - T), (0, 0)))
    return x.reshape(B, t_f, fold, C).transpose(0, 2, 3, 1).reshape(B, fold * C, t_f)


def unfold_time(y: jax.Array, fold: int, seq_len: int) -> jax.Array:
    """Inverse of fold_time: (B, fold*C, T_f) -> (B, seq_len, C) NWC."""
    B, PC, t_f = y.shape
    C = PC // fold
    y = y.reshape(B, fold, C, t_f).transpose(0, 3, 1, 2).reshape(B, t_f * fold, C)
    return y[:, :seq_len]


def _used_offsets(K: int, d: int, fold: int) -> Tuple[int, ...]:
    """Sorted input offsets s = p + tap*d - pad that carry at least one weight
    tap for some output phase p.  At fold=1 this is exactly the K tap
    positions (dilation gaps skipped); at fold >= d the range is dense."""
    pad = (K * d - d) // 2
    return tuple(sorted({p + t * d - pad for p in range(fold) for t in range(K)}))


def _conv_metas(K: int, dilations: Sequence[int], fold: int):
    """Per pair: (used_s conv1, folded pad conv1, used_s conv2, folded pad conv2).

    The folded per-side consumption of a conv with real pad `pad` is
    ceil(pad/fold) columns: offsets s span [-pad, fold-1+pad], and with
    s = q*fold + r (r in [0, fold)) the column reach q spans exactly
    [-ceil(pad/fold), floor((fold-1+pad)/fold)] — both bounded by fpad.
    """
    pad2 = (K - 1) // 2
    used2 = _used_offsets(K, 1, fold)
    fpad2 = -(-pad2 // fold)
    metas = []
    for d in dilations:
        pad1 = (K * d - d) // 2
        metas.append((_used_offsets(K, d, fold), -(-pad1 // fold), used2, fpad2))
    return tuple(metas)


def _fold_weight(w: jax.Array, fold: int, d: int, used_s: Tuple[int, ...]) -> jax.Array:
    """(K, C_in, C_out) conv weight -> block-Toeplitz (fold*C_out, n_s*C_in).

    Row block p, contraction block idx(s) holds W[tap]^T when
    s = p + tap*d - pad for some tap, else zeros.  Output row p*C_out + c_out
    of the matmul against the s-indexed im2col is then time-phase p of the
    SAME-conv output.  fold=1 reduces to the plain im2col layout
    [c_out, tap*C_in + c_in].
    """
    K, ci, co = w.shape
    pad = (K * d - d) // 2
    wt = jnp.transpose(w, (0, 2, 1))  # (K, C_out, C_in)
    if fold == 1:
        # used_s order == tap order at fold=1: plain im2col [co, tap*ci + ci]
        return jnp.transpose(wt, (1, 0, 2)).reshape(co, K * ci)
    index = {s: i for i, s in enumerate(used_s)}
    p_arr = np.repeat(np.arange(fold), K)
    tap_arr = np.tile(np.arange(K), fold)
    idx_arr = np.array([index[p + t * d - pad] for p, t in zip(p_arr, tap_arr)])
    z = jnp.zeros((fold, len(used_s), co, ci), w.dtype)
    z = z.at[p_arr, idx_arr].set(wt[tap_arr])  # each (p, s) hits at most one tap
    return z.transpose(0, 2, 1, 3).reshape(fold * co, len(used_s) * ci)


def _group_plan(K: int, d: int, fold: int, used_s: Tuple[int, ...], n_groups: int):
    """Per phase group: (first_phase, G, read_start_block, span) against the
    GLOBAL im2col block order, with a uniform span (max over groups, starts
    clamped) so the stacked group weight is one (n_groups, G*C, span*C) array.
    Interior offsets a group never touches stay zero blocks in its weight."""
    n_s = len(used_s)
    index = {s: i for i, s in enumerate(used_s)}
    G = fold // n_groups
    pad = (K * d - d) // 2
    raw = []
    span = 0
    for g in range(n_groups):
        idxs = [index[p + t * d - pad] for p in range(g * G, (g + 1) * G) for t in range(K)]
        lo, hi = min(idxs), max(idxs)
        raw.append((g * G, G, lo))
        span = max(span, hi - lo + 1)
    return tuple((p0, G, min(lo, n_s - span), span) for p0, G, lo in raw)


def _fold_weight_grouped(
    w: jax.Array, fold: int, d: int, used_s: Tuple[int, ...], plan
) -> jax.Array:
    """(K, C_in, C_out) conv weight -> (n_groups, G*C_out, span*C_in).

    Group g holds the block-Toeplitz rows of its G phases, with contraction
    columns restricted to the offset-block window [read_start, read_start +
    span) of the global im2col — the only blocks those phases' taps touch.
    Semantically identical to slicing _fold_weight's output rows/columns."""
    K, ci, co = w.shape
    pad = (K * d - d) // 2
    index = {s: i for i, s in enumerate(used_s)}
    wt = jnp.transpose(w, (0, 2, 1))  # (K, C_out, C_in)
    n_groups = len(plan)
    G, span = plan[0][1], plan[0][3]
    g_arr, p_arr, t_arr, col_arr = [], [], [], []
    for g, (p0, G_, lo, _span) in enumerate(plan):
        for pp in range(G_):
            for t in range(K):
                g_arr.append(g)
                p_arr.append(pp)
                t_arr.append(t)
                col_arr.append(index[p0 + pp + t * d - pad] - lo)
    z = jnp.zeros((n_groups, G, span, co, ci), w.dtype)
    z = z.at[g_arr, p_arr, col_arr].set(wt[np.asarray(t_arr)])
    return z.transpose(0, 1, 3, 2, 4).reshape(n_groups, G * co, span * ci)


def _fold_weight_taps(w: jax.Array, fold: int, d: int, fpad: int) -> jax.Array:
    """(K, C_in, C_out) conv weight -> folded taps (2*fpad+1, fold*C_out, fold*C_in).

    The folded conv is an ordinary dense conv over folded columns:
    y_f[:, t] = sum_q W_q @ x_f[:, t + q], q in [-fpad, fpad], where
    W_q[p*C_out + co, r*C_in + ci] = w[tap, ci, co] for the unique (q, r)
    with p + tap*d - pad = q*fold + r.  Fewer, denser matmuls than the
    im2col form (contraction AND rows both P*C) at the cost of more padded
    FLOPs — the kernel never materializes an im2col buffer in this mode.
    """
    K, ci, co = w.shape
    pad = (K * d - d) // 2
    wt = jnp.transpose(w, (0, 2, 1))  # (K, C_out, C_in)
    p_arr = np.repeat(np.arange(fold), K)
    tap_arr = np.tile(np.arange(K), fold)
    s = p_arr + tap_arr * d - pad
    q_arr = np.floor_divide(s, fold) + fpad  # in [0, 2*fpad]
    r_arr = np.mod(s, fold)
    z = jnp.zeros((2 * fpad + 1, fold, fold, co, ci), w.dtype)
    z = z.at[q_arr, p_arr, r_arr].set(wt[tap_arr])  # (q, p, r) <-> (p, s): unique
    return z.transpose(0, 1, 3, 2, 4).reshape(2 * fpad + 1, fold * co, fold * ci)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _edge_mask(vals, start_col: int, w: int, *, base, P: int, C: int, seq_len: int):
    """SAME-conv semantics: zero every conv INPUT outside the real sequence
    [0, seq_len).  Real position of (row, col) in folded space is
    (base + start_col + col) * P + row // C.  Shared by the per-branch and
    whole-stage kernels — their edge/geometry logic must stay in lockstep."""
    cols = base + start_col + jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    if P == 1:
        g = cols
    else:
        g = cols * P + jax.lax.broadcasted_iota(jnp.int32, (P * C, w), 0) // C
    return jnp.where((g >= 0) & (g < seq_len), vals, 0.0)


def _fill_im2col(act, used_s, fpad: int, o_w: int, *, im_buf, P: int, C: int):
    """Pack the offset-shifted input slices into the in-VMEM im2col: offset s
    reads the input's phase-row r = s % P shifted by q = s // P columns."""
    for k, s in enumerate(used_s):
        q, r = divmod(s, P)
        c0 = fpad + q
        im_buf[k * C : (k + 1) * C, pl.ds(0, o_w)] = act[r * C : (r + 1) * C, c0 : c0 + o_w]


def _im2col_conv(act, w_ref, used_s, fpad: int, o_w: int, *, im_buf, P: int, C: int):
    """One folded conv on `act` (already lrelu'd/masked/cast) via the in-VMEM
    im2col; output width o_w, f32 accumulation."""
    _fill_im2col(act, used_s, fpad, o_w, im_buf=im_buf, P=P, C=C)
    return jax.lax.dot_general(
        w_ref[...],
        im_buf[pl.ds(0, len(used_s) * C), pl.ds(0, o_w)],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _grouped_conv(act, w_ref, used_s, fpad: int, o_w: int, plan, *, im_buf, P: int, C: int):
    """Block-sparse folded conv: same im2col as the dense path, then one
    matmul per phase group contracting ONLY the offset-block window that
    group's taps populate — skips most of the dense fold's structural-zero
    FLOPs at the cost of G*C (< 128) output rows per matmul."""
    _fill_im2col(act, used_s, fpad, o_w, im_buf=im_buf, P=P, C=C)
    parts = []
    for g, (_p0, _G, lo, span) in enumerate(plan):
        parts.append(
            jax.lax.dot_general(
                w_ref[g],
                im_buf[lo * C : (lo + span) * C, pl.ds(0, o_w)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(parts, axis=0)


def _conv_pair_chain(buf, h_buf, metas, n_pairs: int, w1_refs, w2_refs, b1_ref, b2_ref,
                     offset: int, width: int, slope: float, op_dtype, conv, masked) -> int:
    """Run one branch's (dilated conv → lrelu → conv → residual) pairs in
    place on `buf` starting at folded halo `offset`; returns the final
    offset.  `conv`/`masked` are the kernel-local closures (taps, im2col or
    grouped packing; block-local base)."""
    for j in range(n_pairs):
        m = metas[j]
        used1, fpad1, used2, fpad2 = m[:4]
        plan1, plan2 = (m[4], m[5]) if len(m) > 4 else (None, None)
        in_w = width - 2 * offset
        mid_w = in_w - 2 * fpad1
        out_w = mid_w - 2 * fpad2

        xin = buf[:, pl.ds(offset, in_w)]
        act = jnp.where(xin > 0, xin, xin * slope)
        act = masked(act, offset, in_w).astype(op_dtype)
        acc = conv(act, w1_refs[j], used1, fpad1, mid_w, plan1)
        acc += b1_ref[j].astype(jnp.float32)
        h_buf[:, pl.ds(0, mid_w)] = acc

        # conv2 (undilated) on lrelu(h)
        hmid = h_buf[:, pl.ds(0, mid_w)]
        act2 = jnp.where(hmid > 0, hmid, hmid * slope)
        act2 = masked(act2, offset + fpad1, mid_w).astype(op_dtype)
        acc2 = conv(act2, w2_refs[j], used2, fpad2, out_w, plan2)
        acc2 += b2_ref[j].astype(jnp.float32)

        # residual add against the matching center slice of the activation
        new_offset = offset + fpad1 + fpad2
        res = buf[:, pl.ds(new_offset, out_w)]
        buf[:, pl.ds(new_offset, out_w)] = res + acc2
        offset = new_offset
    return offset


def _mrf_kernel(
    x_ref,  # (1, P*C, W) folded input incl. halo
    *rest,  # n_pairs conv1 weights, n_pairs conv2 weights, b1, b2, out, scratch
    n_pairs: int,
    metas,
    fold: int,
    chans: int,
    halo_f: int,
    t_blk: int,
    width: int,
    slope: float,
    seq_len: int,
    packing: str,
):
    # MXU shape note: a per-tap (C_out, C_in) x (C_in, T) matmul fills only
    # C/128 of the MXU's contraction AND output-row dims — 12.5% at C=16.
    # The im2col packs n_s offset-shifted copies of the input into the
    # contraction (up to ~900 rows), and phase folding packs `fold` output
    # time-phases into the output rows (P*C = 128 at C=16): each conv is ONE
    # (P*C, n_s*C) x (n_s*C, T_blk) matmul in the caller's compute dtype
    # (bf16 in production) with f32 accumulation.  In "taps" packing the
    # im2col buffer disappears entirely: each conv is 2*fpad+1 dense
    # (P*C, P*C) x (P*C, T_blk) matmuls read straight off the activation
    # value at shifted column offsets.  Per-stage measurements and the
    # padded-FLOP accounting live in PARITY.md.
    w1_refs = rest[:n_pairs]
    w2_refs = rest[n_pairs : 2 * n_pairs]
    b1_ref = rest[2 * n_pairs]
    b2_ref = rest[2 * n_pairs + 1]
    o_ref = rest[2 * n_pairs + 2]
    if packing == "taps":
        x_buf, h_buf = rest[2 * n_pairs + 3 :]
        im_buf = None
        op_dtype = w1_refs[0].dtype
    else:
        x_buf, h_buf, im_buf = rest[2 * n_pairs + 3 :]
        op_dtype = im_buf.dtype

    P, C = fold, chans
    x_buf[...] = x_ref[0].astype(jnp.float32)

    # folded column of buffer column 0 (block i's output starts at folded
    # column i*t_blk; the buffer holds halo_f extra columns on the left)
    base = pl.program_id(1) * t_blk - halo_f

    def masked(vals, start_col, w):
        return _edge_mask(vals, start_col, w, base=base, P=P, C=C, seq_len=seq_len)

    def conv(act, w_ref, used_s, fpad, o_w, plan=None):
        if packing == "taps":
            # no im2col buffer in taps mode: 2*fpad+1 dense matmuls read
            # straight off the activation at shifted column offsets
            acc = None
            for qi in range(2 * fpad + 1):
                part = jax.lax.dot_general(
                    w_ref[qi],
                    act[:, qi : qi + o_w],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
            return acc
        if packing == "grouped":
            return _grouped_conv(act, w_ref, used_s, fpad, o_w, plan, im_buf=im_buf, P=P, C=C)
        return _im2col_conv(act, w_ref, used_s, fpad, o_w, im_buf=im_buf, P=P, C=C)

    _conv_pair_chain(
        x_buf, h_buf, metas, n_pairs, w1_refs, w2_refs, b1_ref, b2_ref,
        0, width, slope, op_dtype, conv, masked,
    )

    o_ref[0] = x_buf[:, pl.ds(halo_f, t_blk)].astype(o_ref.dtype)


def _mrf_stage_kernel(
    x_ref,  # (1, P*C, W) folded input incl. the max branch halo
    *rest,  # per branch: n_pairs w1, n_pairs w2, b1, b2; then out + scratch
    branch_metas,
    n_pairs_list,
    fold: int,
    chans: int,
    halo_f_max: int,
    halo_f_list,
    t_blk: int,
    width: int,
    slope: float,
    seq_len: int,
):
    """Whole-MRF-stage kernel: ALL branches of one stage + their mean.

    The round-4 per-stage roofline (PARITY.md) showed the three narrow fused
    stages 3-5x off both chip roofs while the per-branch kernel re-reads the
    stage input from HBM, re-converts it to f32, re-computes the edge masks,
    and writes each branch output back to HBM for an XLA sum.  Fusing the
    branches shares ONE input read / f32 conversion / mask per block and
    writes only the divided sum: per stage the HBM traffic drops from
    3 reads + 4 writes of the activation to 1 + 1 (plus the fold/unfold
    transposes either way).  Branch chains with different receptive fields
    start at per-branch offsets inside the shared (max-halo) window and all
    land on the same [halo_f_max, halo_f_max + t_blk) output columns.
    """
    idx = 0
    branch_refs = []
    for n_pairs in n_pairs_list:
        w1_refs = rest[idx : idx + n_pairs]
        w2_refs = rest[idx + n_pairs : idx + 2 * n_pairs]
        b1_ref, b2_ref = rest[idx + 2 * n_pairs], rest[idx + 2 * n_pairs + 1]
        idx += 2 * n_pairs + 2
        branch_refs.append((w1_refs, w2_refs, b1_ref, b2_ref))
    o_ref = rest[idx]
    x_buf, work, h_buf, acc_buf, im_buf = rest[idx + 1 :]
    op_dtype = im_buf.dtype

    P, C = fold, chans
    x_buf[...] = x_ref[0].astype(jnp.float32)
    base = pl.program_id(1) * t_blk - halo_f_max

    def masked(vals, start_col, w):
        return _edge_mask(vals, start_col, w, base=base, P=P, C=C, seq_len=seq_len)

    def conv(act, w_ref, used_s, fpad, o_w, plan=None):
        return _im2col_conv(act, w_ref, used_s, fpad, o_w, im_buf=im_buf, P=P, C=C)

    for br, (w1_refs, w2_refs, b1_ref, b2_ref) in enumerate(branch_refs):
        work[...] = x_buf[...]
        # branch chains with different receptive fields start at per-branch
        # offsets inside the shared (max-halo) window
        _conv_pair_chain(
            work, h_buf, branch_metas[br], n_pairs_list[br], w1_refs, w2_refs, b1_ref, b2_ref,
            halo_f_max - halo_f_list[br], width, slope, op_dtype, conv, masked,
        )

        out_cols = work[:, pl.ds(halo_f_max, t_blk)]
        if br == 0:
            acc_buf[...] = out_cols
        else:
            acc_buf[...] = acc_buf[...] + out_cols

    o_ref[0] = (acc_buf[...] * (1.0 / len(branch_refs))).astype(o_ref.dtype)


VMEM_BUDGET = 12 * 2**20  # conservative slice of the ~16 MB per-core VMEM


def _branch_vmem_bytes(
    C: int, n_pairs: int, width: int, t_blk: int, itemsize: int, fold: int, ns_list, packing: str
) -> int:
    """Rough VMEM footprint of one kernel invocation."""
    PC = C * fold
    if packing == "taps":
        # ns_list carries n_q per conv; each conv's weight is (n_q, PC, PC)
        weights = sum(nq * PC * PC for nq in ns_list) * itemsize + 2 * n_pairs * PC * 4
        scratch = 2 * PC * width * 4  # two f32 (PC, width) buffers, no im2col
    else:
        weights = sum(ns * C * PC for ns in ns_list) * itemsize + 2 * n_pairs * PC * 4
        scratch = 2 * PC * width * 4  # two f32 (PC, width) buffers
        scratch += max(ns_list) * C * width * itemsize  # im2col buffer (operand dtype)
    blocks = 2 * PC * width * itemsize + 2 * PC * t_blk * itemsize  # in (dbl-buffered) + out
    return weights + scratch + blocks


def _geometry(K: int, dilations: Sequence[int], fold: int, packing: str = "im2col"):
    metas = _conv_metas(K, dilations, fold)
    halo_f = sum(m[1] + m[3] for m in metas)
    if packing == "taps":
        ns_list = [2 * m[1] + 1 for m in metas] + [2 * m[3] + 1 for m in metas]
    else:
        ns_list = [len(m[0]) for m in metas] + [len(m[2]) for m in metas]
    if packing == "grouped":
        # extend each pair's meta with its two phase-group plans; ns_list
        # (global offsets) stays the conservative VMEM bound — the grouped
        # weights are strictly smaller and the im2col is unchanged
        metas = tuple(
            m + (_group_plan(K, d, fold, m[0], MRF_GROUPS), _group_plan(K, 1, fold, m[2], MRF_GROUPS))
            for m, d in zip(metas, dilations)
        )
    return metas, halo_f, ns_list


def pick_t_blk(
    C: int, K: int, n_pairs: int, dilations: Sequence[int], itemsize: int, fold: int = 1, packing: str = "im2col"
) -> int:
    """Largest 128-multiple time block (<=1024 folded columns) whose
    invocation fits VMEM; 0 if even the minimum block does not fit (caller
    falls back to XLA)."""
    _, halo_f, ns_list = _geometry(K, dilations, fold, packing)
    for t_blk in (1024, 768, 512, 384, 256, 128):
        width = -(-(t_blk + 2 * halo_f) // 128) * 128
        if _branch_vmem_bytes(C, n_pairs, width, t_blk, itemsize, fold, ns_list, packing) <= VMEM_BUDGET:
            return t_blk
    return 0


def fused_branch_fits(
    C: int, K: int, n_pairs: int, dilations: Sequence[int], itemsize: int = 2, fold: int = 1,
    packing: str = "im2col",
) -> bool:
    return pick_t_blk(C, K, n_pairs, dilations, itemsize, fold=fold, packing=packing) > 0


def mrf_branch_pallas(
    x: jax.Array,  # (B, T, C) NWC, or folded (B, fold*C, T_f) when prefolded_len is given
    w1: jax.Array,  # (n_pairs, K, C, C) in WIO-per-pair converted to (pairs, K, C_out, C_in)
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    dilations: Tuple[int, ...],
    slope: float = LRELU_SLOPE,
    t_blk: int | None = None,
    interpret: bool = False,
    fold: int = 1,
    prefolded_len: Optional[int] = None,
    packing: str = "im2col",
) -> jax.Array:
    """Fused branch in (C, T)-layout Pallas; input/output stay NWC.

    ``fold=P > 1`` phase-folds time into the matmul output rows (docstring at
    the top of the module).  ``prefolded_len``: the caller already holds x in
    folded layout (B, fold*C, ceil(T/fold)) — pass the true T here; the
    output stays folded (the generator folds once per MRF stage and shares
    the layout across its three branches, models/hifigan.py).
    ``packing``: "im2col" (one matmul per conv over an in-VMEM im2col) or
    "taps" (2*fpad+1 dense (P*C, P*C) matmuls, no im2col buffer).
    """
    if packing not in ("im2col", "taps", "grouped"):
        raise ValueError(f"unknown packing {packing!r}")
    P = int(fold)
    if packing == "grouped" and (P <= 1 or P % MRF_GROUPS != 0):
        packing = "im2col"  # grouping needs >= MRF_GROUPS phases to split
    n_pairs, K, C, _ = w1.shape
    if K % 2 == 0:
        # the halo/tap bookkeeping assumes lax SAME's symmetric padding,
        # which only holds for odd effective kernels (even K pads (p, p+1)
        # asymmetrically and the tap slices go off by one)
        raise ValueError(f"fused MRF branch requires odd kernel sizes, got K={K}")
    PC = P * C
    if prefolded_len is not None:
        B, pc_in, _ = x.shape
        if pc_in != PC:
            raise ValueError(f"prefolded input has {pc_in} rows, expected fold*C = {PC}")
        T = int(prefolded_len)
        x_f = x
    else:
        B, T, _ = x.shape
        x_f = fold_time(x, P) if P > 1 else jnp.swapaxes(x, 1, 2)
    t_f = x_f.shape[2]

    metas, halo_f, _ = _geometry(K, tuple(dilations), P, packing)
    if t_blk is None:
        t_blk = pick_t_blk(C, K, n_pairs, dilations, x.dtype.itemsize, fold=P, packing=packing)
        if t_blk == 0:
            raise ValueError(f"fused MRF branch (C={C}, K={K}, fold={P}, {packing}) does not fit VMEM")
    # window width must be a 128-multiple (Mosaic lane-dim block constraint);
    # the left pad is exactly halo_f, the rounding slack rides on the right
    # as always-masked columns
    width = -(-(t_blk + 2 * halo_f) // 128) * 128
    n_blocks = -(-t_f // t_blk)
    l_pad = n_blocks * t_blk + (width - t_blk)
    x_pad = jnp.pad(x_f, ((0, 0), (0, 0), (halo_f, l_pad - halo_f - t_f)))

    # block-Toeplitz weights: (pairs, K, C_in, C_out) -> per-conv
    # (P*C_out, n_s*C_in) [im2col] or (n_q, P*C_out, P*C_in) [taps];
    # biases tile across phases -> (pairs, P*C, 1)
    if packing == "taps":
        w1f = [_fold_weight_taps(w1[j], P, d, metas[j][1]) for j, d in enumerate(dilations)]
        w2f = [_fold_weight_taps(w2[j], P, 1, metas[j][3]) for j in range(n_pairs)]
    elif packing == "grouped":
        w1f = [_fold_weight_grouped(w1[j], P, d, metas[j][0], metas[j][4]) for j, d in enumerate(dilations)]
        w2f = [_fold_weight_grouped(w2[j], P, 1, metas[j][2], metas[j][5]) for j in range(n_pairs)]
    else:
        w1f = [_fold_weight(w1[j], P, d, metas[j][0]) for j, d in enumerate(dilations)]
        w2f = [_fold_weight(w2[j], P, 1, metas[j][2]) for j in range(n_pairs)]
    b1f = jnp.tile(b1, (1, P))[..., None]
    b2f = jnp.tile(b2, (1, P))[..., None]
    max_ns_c = max(max(len(m[0]), len(m[2])) for m in metas) * C

    grid = (B, n_blocks)
    kernel = functools.partial(
        _mrf_kernel,
        n_pairs=n_pairs,
        metas=metas,
        fold=P,
        chans=C,
        halo_f=halo_f,
        t_blk=t_blk,
        width=width,
        slope=slope,
        seq_len=T,
        packing=packing,
    )
    in_specs = [
        # overlapping halo windows: time dim is Element-indexed — window i
        # covers elements [i*t_blk, i*t_blk + width) of the halo-padded x
        pl.BlockSpec(
            (pl.Element(1), pl.Element(PC), pl.Element(width)),
            lambda b, i: (b, 0, i * t_blk),
        )
    ]
    for wf in w1f + w2f:
        # weights are grid-invariant: single-buffer them (no double
        # buffering) so wide-channel stages fit in VMEM
        zeros = (0,) * wf.ndim
        in_specs.append(pl.BlockSpec(wf.shape, lambda b, i, z=zeros: z, pipeline_mode=pl.Buffered(1)))
    in_specs.append(pl.BlockSpec(b1f.shape, lambda b, i: (0, 0, 0), pipeline_mode=pl.Buffered(1)))
    in_specs.append(pl.BlockSpec(b2f.shape, lambda b, i: (0, 0, 0), pipeline_mode=pl.Buffered(1)))

    scratch_shapes = [
        pltpu.VMEM((PC, width), jnp.float32),
        pltpu.VMEM((PC, width), jnp.float32),
    ]
    if packing != "taps":
        scratch_shapes.append(pltpu.VMEM((max_ns_c, width), x.dtype))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, PC, t_blk), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, PC, n_blocks * t_blk), x.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(x_pad, *w1f, *w2f, b1f, b2f)

    y = out[:, :, :t_f]
    if prefolded_len is not None:
        return y
    return unfold_time(y, P, T) if P > 1 else jnp.swapaxes(y, 1, 2)[:, :T]


# ---------------------------------------------------------------------------
# whole-stage fusion: all MRF branches + their mean in one kernel
# ---------------------------------------------------------------------------


def _stage_vmem_bytes(C: int, width: int, t_blk: int, itemsize: int, fold: int, branch_geoms) -> int:
    PC = C * fold
    weights = 0
    max_ns = 0
    for _, _, ns_list, n_pairs in branch_geoms:
        weights += sum(ns * C * PC for ns in ns_list) * itemsize + 2 * n_pairs * PC * 4
        max_ns = max(max_ns, max(ns_list))
    scratch = 3 * PC * width * 4 + PC * t_blk * 4  # x_buf + work + h_buf (f32) + acc
    scratch += max_ns * C * width * itemsize  # shared im2col buffer
    blocks = 2 * PC * width * itemsize + 2 * PC * t_blk * itemsize
    return weights + scratch + blocks


def _stage_geoms(branch_shapes, fold: int):
    """branch_shapes: sequence of (K, dilations) -> per-branch
    (metas, halo_f, ns_list, n_pairs)."""
    geoms = []
    for K, dilations in branch_shapes:
        metas, halo_f, ns_list = _geometry(K, tuple(dilations), fold, "im2col")
        geoms.append((metas, halo_f, ns_list, len(dilations)))
    return geoms


def pick_stage_t_blk(C: int, branch_shapes, itemsize: int, fold: int = 1) -> int:
    geoms = _stage_geoms(branch_shapes, fold)
    halo_f_max = max(g[1] for g in geoms)
    for t_blk in (1024, 768, 512, 384, 256, 128):
        width = -(-(t_blk + 2 * halo_f_max) // 128) * 128
        if _stage_vmem_bytes(C, width, t_blk, itemsize, fold, geoms) <= VMEM_BUDGET:
            return t_blk
    return 0


def fused_stage_fits(C: int, branch_shapes, itemsize: int = 2, fold: int = 1) -> bool:
    return pick_stage_t_blk(C, branch_shapes, itemsize, fold=fold) > 0


def mrf_stage_pallas(
    x: jax.Array,  # (B, T, C) NWC, or folded (B, fold*C, T_f) when prefolded_len is given
    branches,  # sequence of (w1, b1, w2, b2, dilations); w1/w2 (n_pairs, K, C, C)
    slope: float = LRELU_SLOPE,
    t_blk: int | None = None,
    interpret: bool = False,
    fold: int = 1,
    prefolded_len: Optional[int] = None,
) -> jax.Array:
    """One whole MRF stage — every branch plus the mean — in one Pallas call.

    Semantics: ``mean_i(mrf_branch_reference(x, *branches[i]))`` (the
    generator's per-stage reduction, models/hifigan.py:287-292), with the
    division fused and the sum accumulated in f32.  Input/output layouts
    match ``mrf_branch_pallas`` (NWC, or folded when ``prefolded_len``).
    im2col packing only (the taps variant measured slower — PARITY.md).
    """
    P = int(fold)
    shapes = []
    for w1, _, _, _, dil in branches:
        n_pairs, K, C, _ = w1.shape
        if K % 2 == 0:
            raise ValueError(f"fused MRF stage requires odd kernel sizes, got K={K}")
        shapes.append((K, tuple(dil)))
    PC = P * C

    if prefolded_len is not None:
        B, pc_in, _ = x.shape
        if pc_in != PC:
            raise ValueError(f"prefolded input has {pc_in} rows, expected fold*C = {PC}")
        T = int(prefolded_len)
        x_f = x
    else:
        B, T, _ = x.shape
        x_f = fold_time(x, P) if P > 1 else jnp.swapaxes(x, 1, 2)
    t_f = x_f.shape[2]

    geoms = _stage_geoms(shapes, P)
    halo_f_max = max(g[1] for g in geoms)
    if t_blk is None:
        t_blk = pick_stage_t_blk(C, shapes, x.dtype.itemsize, fold=P)
        if t_blk == 0:
            raise ValueError(f"fused MRF stage (C={C}, fold={P}) does not fit VMEM")
    width = -(-(t_blk + 2 * halo_f_max) // 128) * 128
    n_blocks = -(-t_f // t_blk)
    l_pad = n_blocks * t_blk + (width - t_blk)
    x_pad = jnp.pad(x_f, ((0, 0), (0, 0), (halo_f_max, l_pad - halo_f_max - t_f)))

    operands = []
    in_specs = [
        pl.BlockSpec(
            (pl.Element(1), pl.Element(PC), pl.Element(width)),
            lambda b, i: (b, 0, i * t_blk),
        )
    ]
    branch_metas, halo_f_list, n_pairs_list = [], [], []
    max_ns_c = 0
    for (w1, b1, w2, b2, dil), (metas, halo_f, ns_list, n_pairs) in zip(branches, geoms):
        w1f = [_fold_weight(w1[j], P, d, metas[j][0]) for j, d in enumerate(dil)]
        w2f = [_fold_weight(w2[j], P, 1, metas[j][2]) for j in range(n_pairs)]
        b1f = jnp.tile(b1, (1, P))[..., None]
        b2f = jnp.tile(b2, (1, P))[..., None]
        for wf in w1f + w2f:
            zeros = (0,) * wf.ndim
            in_specs.append(pl.BlockSpec(wf.shape, lambda b, i, z=zeros: z, pipeline_mode=pl.Buffered(1)))
        in_specs.append(pl.BlockSpec(b1f.shape, lambda b, i: (0, 0, 0), pipeline_mode=pl.Buffered(1)))
        in_specs.append(pl.BlockSpec(b2f.shape, lambda b, i: (0, 0, 0), pipeline_mode=pl.Buffered(1)))
        operands.extend(w1f + w2f + [b1f, b2f])
        branch_metas.append(metas)
        halo_f_list.append(halo_f)
        n_pairs_list.append(n_pairs)
        max_ns_c = max(max_ns_c, max(ns_list) * C)

    kernel = functools.partial(
        _mrf_stage_kernel,
        branch_metas=tuple(branch_metas),
        n_pairs_list=tuple(n_pairs_list),
        fold=P,
        chans=C,
        halo_f_max=halo_f_max,
        halo_f_list=tuple(halo_f_list),
        t_blk=t_blk,
        width=width,
        slope=slope,
        seq_len=T,
    )
    scratch_shapes = [
        pltpu.VMEM((PC, width), jnp.float32),  # x_buf (pristine input)
        pltpu.VMEM((PC, width), jnp.float32),  # work (per-branch residual chain)
        pltpu.VMEM((PC, width), jnp.float32),  # h_buf
        pltpu.VMEM((PC, t_blk), jnp.float32),  # acc (branch sum)
        pltpu.VMEM((max_ns_c, width), x.dtype),  # shared im2col
    ]

    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, PC, t_blk), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, PC, n_blocks * t_blk), x.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(x_pad, *operands)

    y = out[:, :, :t_f]
    if prefolded_len is not None:
        return y
    return unfold_time(y, P, T) if P > 1 else jnp.swapaxes(y, 1, 2)[:, :T]
