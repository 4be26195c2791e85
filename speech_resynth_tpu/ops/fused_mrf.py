"""Fused multi-receptive-field residual branch (HiFi-GAN) Pallas kernel.

The north-star vocoder kernel (BASELINE.json): one ResidualBlock branch —
three (dilated conv -> leaky-relu -> conv -> +residual) pairs of kernel size
k with dilations (1, 3, 5) — computed entirely in VMEM per time block.

Why XLA leaves performance here: HiFi-GAN's late stages have tiny channel
counts (64/32/16) at huge time lengths (40k-160k); in NWC layout the MXU's
128 lanes carry C_out and sit mostly idle, and each of the 6 convs round-trips
the full activation through HBM.  This kernel:

  * runs in (C, T) layout — lanes carry TIME (always 128-aligned), sublanes
    carry channels; each conv is ONE (C_out, K*C_in) x (K*C_in, T_blk) matmul
    over an in-VMEM im2col, so the MXU contraction dim is K*C (up to 704 at
    K=11, C=64) instead of a starved C (12.5% fill at C=16);
  * matmul operands in the caller's compute dtype (bf16 in production ->
    full-rate MXU; f32 in the interpret parity tests), f32 accumulation,
    residual chain carried in f32;
  * keeps the whole 6-conv chain in VMEM scratch — one HBM read of the input
    block (+halo) and one write of the output block;
  * fuses every leaky-relu and residual add.

A lax reference implementation (`mrf_branch_reference`, NWC) defines the
semantics (matches models/hifigan.py:ResidualBlock, i.e. the reference's
HifiGanResidualBlock torch graph).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def branch_halo(kernel_size: int, dilations: Sequence[int]) -> int:
    """Per-side receptive-field growth of the 6-conv chain."""
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


def _mrf_kernel(
    x_ref,  # (1, C, T_blk + 2*halo) input incl. halo
    w1_ref,  # (n_pairs, C, K*C) — [cout, tap*C + cin] (im2col-flattened taps)
    b1_ref,  # (n_pairs, C, 1)
    w2_ref,
    b2_ref,
    o_ref,  # (1, C, T_blk)
    x_buf,  # VMEM scratch (C, T_blk + 2*halo) f32 (residual chain accumulates f32)
    h_buf,  # VMEM scratch (C, T_blk + 2*halo) f32
    im_buf,  # VMEM scratch (K*C, T_blk + 2*halo) operand dtype (im2col)
    *,
    kernel_size: int,
    dilations: Tuple[int, ...],
    halo: int,
    t_blk: int,
    slope: float,
    seq_len: int,
):
    # MXU shape note: a per-tap (C_out, C_in) x (C_in, T) matmul fills only
    # C/128 of the MXU's contraction dim — 12.5% at C=16.  Packing the K taps
    # into the contraction dim via an in-VMEM im2col makes each conv ONE
    # (C, K*C) x (K*C, T) matmul (contraction up to 704 at K=11, C=64), and
    # running the dot in the caller's compute dtype (bf16 in production, f32
    # in the interpret-mode parity tests) with f32 accumulation gets the
    # full MXU rate on the contraction.  Measured effect is modest — whole
    # headline vocoder 66.8 -> 62.7 ms, fused stages 12.9/15.3/20.4 ->
    # 12.5/13.5/18.2 ms (v5e back-to-back, bench_vocoder_stages.py) — because
    # the OUTPUT rows stay C/128-starved and the im2col copies are VPU work;
    # per-stage table and remaining-headroom analysis in PARITY.md.
    C = x_ref.shape[1]
    K = kernel_size
    op_dtype = im_buf.dtype
    x_buf[...] = x_ref[0].astype(jnp.float32)

    # global position of buffer column 0 (sequence starts at -halo for block 0)
    base = pl.program_id(1) * t_blk - halo

    def valid_cols(start_col: int, w: int):
        """True where a buffer column maps inside the real [0, seq_len)."""
        g = base + start_col + jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        return (g >= 0) & (g < seq_len)

    offset = 0  # consumed halo so far
    for j, d in enumerate(dilations):
        pad1 = (kernel_size * d - d) // 2
        pad2 = (kernel_size - 1) // 2
        in_w = (t_blk + 2 * halo) - 2 * offset
        mid_w = in_w - 2 * pad1
        out_w = mid_w - 2 * pad2

        # conv1 (dilated): h_mid[:, t] = sum_tap W1[tap] @ lrelu(x)[:, t + tap*d]
        # SAME-conv semantics: positions outside the true sequence are zero
        # at EVERY conv input (they evolve nonzero through bias/residual here)
        xin = x_buf[:, pl.ds(offset, in_w)]
        act = jnp.where(xin > 0, xin, xin * slope)
        act = jnp.where(valid_cols(offset, in_w), act, 0.0).astype(op_dtype)
        for tap in range(K):
            im_buf[tap * C : (tap + 1) * C, pl.ds(0, mid_w)] = act[:, tap * d : tap * d + mid_w]
        acc = jax.lax.dot_general(
            w1_ref[j], im_buf[:, pl.ds(0, mid_w)], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc += b1_ref[j].astype(jnp.float32)
        h_buf[:, pl.ds(0, mid_w)] = acc

        # conv2 (undilated) on lrelu(h)
        hmid = h_buf[:, pl.ds(0, mid_w)]
        act2 = jnp.where(hmid > 0, hmid, hmid * slope)
        act2 = jnp.where(valid_cols(offset + pad1, mid_w), act2, 0.0).astype(op_dtype)
        for tap in range(K):
            im_buf[tap * C : (tap + 1) * C, pl.ds(0, out_w)] = act2[:, tap : tap + out_w]
        acc2 = jax.lax.dot_general(
            w2_ref[j], im_buf[:, pl.ds(0, out_w)], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc2 += b2_ref[j].astype(jnp.float32)

        # residual add against the matching center slice of x
        new_offset = offset + pad1 + pad2
        res = x_buf[:, pl.ds(new_offset, out_w)]
        x_buf[:, pl.ds(new_offset, out_w)] = res + acc2
        offset = new_offset

    o_ref[0] = x_buf[:, pl.ds(halo, t_blk)].astype(o_ref.dtype)


VMEM_BUDGET = 12 * 2**20  # conservative slice of the ~16 MB per-core VMEM


def _branch_vmem_bytes(C: int, K: int, n_pairs: int, width: int, itemsize: int) -> int:
    """Rough VMEM footprint of one kernel invocation."""
    weights = 2 * n_pairs * K * C * C * itemsize + 2 * n_pairs * C * 4
    scratch = 2 * C * width * 4  # two f32 (C, width) buffers
    scratch += K * C * width * itemsize  # im2col buffer (operand dtype)
    blocks = C * width * itemsize * 2 + C * width * itemsize  # in (dbl-buffered) + out
    return weights + scratch + blocks


def pick_t_blk(C: int, K: int, n_pairs: int, dilations: Sequence[int], itemsize: int) -> int:
    """Largest 128-multiple time block (<=1024) whose invocation fits VMEM;
    0 if even the minimum block does not fit (caller falls back to XLA)."""
    halo = -(-branch_halo(K, dilations) // 64) * 64
    for t_blk in (1024, 768, 512, 384, 256, 128):
        if _branch_vmem_bytes(C, K, n_pairs, t_blk + 2 * halo, itemsize) <= VMEM_BUDGET:
            return t_blk
    return 0


def fused_branch_fits(C: int, K: int, n_pairs: int, dilations: Sequence[int], itemsize: int = 2) -> bool:
    return pick_t_blk(C, K, n_pairs, dilations, itemsize) > 0


def mrf_branch_pallas(
    x: jax.Array,  # (B, T, C)
    w1: jax.Array,  # (n_pairs, K, C, C) in WIO-per-pair converted to (pairs, K, C_out, C_in)
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    dilations: Tuple[int, ...],
    slope: float = LRELU_SLOPE,
    t_blk: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused branch in (C, T)-layout Pallas; input/output stay NWC."""
    B, T, C = x.shape
    K = w1.shape[1]
    if K % 2 == 0:
        # the halo/tap bookkeeping assumes lax SAME's symmetric padding,
        # which only holds for odd effective kernels (even K pads (p, p+1)
        # asymmetrically and the tap slices go off by one)
        raise ValueError(f"fused MRF branch requires odd kernel sizes, got K={K}")
    if t_blk is None:
        t_blk = pick_t_blk(C, K, w1.shape[0], dilations, x.dtype.itemsize)
        if t_blk == 0:
            raise ValueError(f"fused MRF branch (C={C}, K={K}) does not fit VMEM")
    # round the halo up so the window width (t_blk + 2*halo) stays a
    # 128-multiple — Mosaic requires lane-dim blocks divisible by 128
    halo = -(-branch_halo(K, dilations) // 64) * 64

    t_pad = -(-T // t_blk) * t_blk
    xt = jnp.swapaxes(x, 1, 2)  # (B, C, T)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (halo, halo + (t_pad - T))))

    # weights: reference layout (pairs, K, C_in, C_out) -> im2col-flattened
    # (pairs, C_out, K*C_in), contraction index tap*C + c_in to match the
    # kernel's in-VMEM im2col packing
    w1k = jnp.transpose(w1, (0, 3, 1, 2)).reshape(w1.shape[0], C, K * C)
    w2k = jnp.transpose(w2, (0, 3, 1, 2)).reshape(w2.shape[0], C, K * C)
    b1k = b1[..., None]  # (pairs, C, 1)
    b2k = b2[..., None]

    grid = (B, t_pad // t_blk)
    width = t_blk + 2 * halo
    kernel = functools.partial(
        _mrf_kernel, kernel_size=K, dilations=tuple(dilations), halo=halo, t_blk=t_blk, slope=slope, seq_len=T
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # overlapping halo windows: time dim is Element-indexed — window i
            # covers elements [i*t_blk, i*t_blk + width) of the halo-padded x
            pl.BlockSpec(
                (pl.Element(1), pl.Element(C), pl.Element(width)),
                lambda b, i: (b, 0, i * t_blk),
            ),
            # weights are grid-invariant: single-buffer them (no double
            # buffering) so wide-channel stages fit in VMEM
            pl.BlockSpec((w1.shape[0], C, K * C), lambda b, i: (0, 0, 0), pipeline_mode=pl.Buffered(1)),
            pl.BlockSpec((b1.shape[0], C, 1), lambda b, i: (0, 0, 0), pipeline_mode=pl.Buffered(1)),
            pl.BlockSpec((w2.shape[0], C, K * C), lambda b, i: (0, 0, 0), pipeline_mode=pl.Buffered(1)),
            pl.BlockSpec((b2.shape[0], C, 1), lambda b, i: (0, 0, 0), pipeline_mode=pl.Buffered(1)),
        ],
        out_specs=pl.BlockSpec((1, C, t_blk), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((B, C, t_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((C, width), jnp.float32),
            pltpu.VMEM((C, width), jnp.float32),
            pltpu.VMEM((K * C, width), x.dtype),
        ],
        interpret=interpret,
    )(xt, w1k, b1k, w2k, b2k)

    return jnp.swapaxes(out[:, :, :T], 1, 2)
