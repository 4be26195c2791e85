"""HiFi-GAN vocoder: generator + multi-period/multi-scale discriminators.

Parity targets:
* generator — HF ``FastSpeech2ConformerHifiGan`` (the reference's vocoder,
  /root/reference/src/hifigan/train.py:36-42; config upsample_rates
  [5,4,4,2,2] x320, kernels [10,9,8,4,4], normalize_before=False).  The
  reference never applies weight norm to the generator (train.py builds it
  plain), so generator convs are plain here too.
* discriminators — the reference's MPD (periods 2,3,5,7,11) and MSD
  (3 scales, AvgPool(4,2,pad 2) between) with weight_norm, spectral_norm on
  MSD[0] (/root/reference/src/hifigan/models.py:12-137).
* losses — LSGAN + feature-matching x2 (models.py:140-171).

TPU design: all convs run in NWC/NHWC layouts (channels on lanes, MXU-tiled
by XLA).  Transposed convs are fractionally-strided convs
(``lhs_dilation``) with flipped kernels — exact torch ConvTranspose1d
semantics, verified against torch in tests.  Weight/spectral norm are
reparameterizations computed inside the jitted step (no torch-style hooks).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.precision import Policy, DEFAULT

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HifiGanConfig:
    model_in_dim: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (10, 9, 8, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    leaky_relu_slope: float = 0.1
    normalize_before: bool = False
    initializer_range: float = 0.01

    @classmethod
    def from_dict(cls, v: dict) -> "HifiGanConfig":
        """One parser for every HF-format vocoder config.json consumer
        (composite.from_pretrained/load_pretrained, training validation) —
        key drift between copies once silently dropped leaky_relu_slope /
        normalize_before."""
        d = cls()
        return cls(
            model_in_dim=v.get("model_in_dim", d.model_in_dim),
            upsample_initial_channel=v.get("upsample_initial_channel", d.upsample_initial_channel),
            upsample_rates=tuple(v.get("upsample_rates", d.upsample_rates)),
            upsample_kernel_sizes=tuple(v.get("upsample_kernel_sizes", d.upsample_kernel_sizes)),
            resblock_kernel_sizes=tuple(v.get("resblock_kernel_sizes", d.resblock_kernel_sizes)),
            resblock_dilation_sizes=tuple(tuple(x) for x in v.get("resblock_dilation_sizes", d.resblock_dilation_sizes)),
            leaky_relu_slope=v.get("leaky_relu_slope", d.leaky_relu_slope),
            normalize_before=v.get("normalize_before", d.normalize_before),
        )

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates))

    def waveform_lengths(self, spectrogram_lengths: jax.Array) -> jax.Array:
        """ConvTranspose length propagation (models.py:211-221):
        (L-1)*stride - 2*pad + kernel per stage; net (L-1)*320 + 400."""
        out = spectrogram_lengths
        for k, s in zip(self.upsample_kernel_sizes, self.upsample_rates):
            out = (out - 1) * s - 2 * ((k - s) // 2) + k
        return out


def _normal_init(std: float):
    return nn.initializers.normal(stddev=std)


def conv1d(x, kernel, bias, stride: int = 1, dilation: int = 1, padding="SAME", groups: int = 1):
    """NWC conv; kernel (K, I/groups, O)."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        (stride,),
        padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return out if bias is None else out + bias


def conv_transpose1d(x, kernel, bias, stride: int, padding: int):
    """torch ConvTranspose1d semantics in NWC; kernel (K, I, O) torch-ordered
    taps (converter maps torch (I, O, K) -> (K, I, O) without flipping)."""
    k = kernel.shape[0]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0),
        (1,),
        [(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out if bias is None else out + bias


def conv_transpose1d_subpixel(x, kernel, bias, stride: int, padding: int):
    """Same function as ``conv_transpose1d`` via phase decomposition.

    out[t] = sum_j W[p + j*S] x[q - j] with t + P = q*S + p — so the
    transposed conv is one DENSE kernel-ceil(K/S) conv emitting S*O features
    per input frame, interleaved (sub-pixel / depth-to-time) onto the
    upsampled timeline.  The zero-stuffed ``lhs_dilation`` formulation
    multiplies against (S-1)/S zeros unless the compiler strips them; this
    one feeds the MXU a dense (J*I, S*O) contraction.  Numerically equal to
    conv_transpose1d up to float reassociation (parity test in
    tests/test_hifigan.py)."""
    K, I, O = kernel.shape
    S = stride
    if S == 1:
        return conv_transpose1d(x, kernel, bias, stride, padding)
    J = -(-K // S)
    w = jnp.pad(kernel, ((0, J * S - K), (0, 0), (0, 0))).reshape(J, S, I, O)
    w = jnp.flip(w, axis=0)  # conv correlates; taps need j reversed
    w = jnp.transpose(w, (0, 2, 1, 3)).reshape(J, I, S * O)
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(J - 1, J - 1)], dimension_numbers=("NWC", "WIO", "NWC")
    )  # (B, L+J-1, S*O)
    z = y.reshape(y.shape[0], y.shape[1] * S, O)  # z[:, q*S + p] = phase p of q
    length_out = (x.shape[1] - 1) * S + K - 2 * padding
    out = jax.lax.slice_in_dim(z, padding, padding + length_out, axis=1)
    return out if bias is None else out + bias


_UPSAMPLE_IMPL: Optional[str] = None


@contextlib.contextmanager
def upsample_implementation(impl: Optional[str]):
    """Force the transposed-conv formulation ("dilated" | "subpixel") for
    every upsampler while active — trace-time decision, same discipline as
    ops.attention.attention_implementation: enter BEFORE jitting, use fresh
    jitted fns per variant.  A/B harness: benchmarks/bench_upsample.py."""
    global _UPSAMPLE_IMPL
    prev, _UPSAMPLE_IMPL = _UPSAMPLE_IMPL, impl
    try:
        yield
    finally:
        _UPSAMPLE_IMPL = prev


def upsample_conv_transpose(x, kernel, bias, stride: int, padding: int):
    """Formulation dispatch for the generator upsamplers.  Default is the
    zero-stuffed lhs_dilation form: the whole-vocoder in-context A/B on the
    v5e chip (benchmarks/bench_upsample.py, 2026-08-17) measured dilated
    91.6 ms vs subpixel 103.2 ms per generator_apply_fused call at the
    headline shape (16x500 mel frames) — XLA's own lowering of lhs_dilation
    beats the hand-decomposed dense contraction here, both standalone and
    fused (table in PARITY.md).  The sub-pixel form stays behind this
    override for re-measurement on future hardware/compiler versions."""
    impl = _UPSAMPLE_IMPL or "dilated"
    fn = conv_transpose1d_subpixel if impl == "subpixel" else conv_transpose1d
    return fn(x, kernel, bias, stride, padding)


class PlainConv(nn.Module):
    """Conv1d with explicit torch-style symmetric padding."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    groups: int = 1
    init_std: float = 0.01
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            _normal_init(self.init_std),
            (self.kernel_size, in_ch // self.groups, self.features),
            self.policy.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.policy.param_dtype)
        cd = self.policy.compute_dtype
        return conv1d(
            x.astype(cd), kernel.astype(cd), bias.astype(cd), self.stride, self.dilation, self.padding, self.groups
        )


class PlainConvTranspose(nn.Module):
    features: int
    kernel_size: int
    stride: int
    padding: int
    init_std: float = 0.01
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", _normal_init(self.init_std), (self.kernel_size, in_ch, self.features), self.policy.param_dtype
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.policy.param_dtype)
        cd = self.policy.compute_dtype
        return upsample_conv_transpose(x.astype(cd), kernel.astype(cd), bias.astype(cd), self.stride, self.padding)


class ResidualBlock(nn.Module):
    """Multi-receptive-field residual block (HifiGanResidualBlock parity)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    slope: float = LRELU_SLOPE
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            residual = x
            h = nn.leaky_relu(x, self.slope)
            h = PlainConv(
                self.channels,
                self.kernel_size,
                dilation=d,
                padding=(self.kernel_size * d - d) // 2,
                policy=self.policy,
                name=f"convs1_{i}",
            )(h)
            h = nn.leaky_relu(h, self.slope)
            h = PlainConv(
                self.channels,
                self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                policy=self.policy,
                name=f"convs2_{i}",
            )(h)
            x = h + residual
        return x


class HifiGanGenerator(nn.Module):
    """log-mel (B, T, 80) -> waveform (B, (T-1)*320 + 400)."""

    config: HifiGanConfig = HifiGanConfig()
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, spectrogram: jax.Array) -> jax.Array:
        cfg = self.config
        if cfg.normalize_before:
            mean = self.variable("buffers", "mean", lambda: jnp.zeros((cfg.model_in_dim,), jnp.float32)).value
            scale = self.variable("buffers", "scale", lambda: jnp.ones((cfg.model_in_dim,), jnp.float32)).value
            spectrogram = (spectrogram - mean) / scale

        x = PlainConv(
            cfg.upsample_initial_channel, 7, padding=3, init_std=cfg.initializer_range, policy=self.policy, name="conv_pre"
        )(spectrogram)

        num_kernels = len(cfg.resblock_kernel_sizes)
        for i, (rate, kernel) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            channels = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, cfg.leaky_relu_slope)
            x = PlainConvTranspose(
                channels,
                kernel,
                rate,
                (kernel - rate) // 2,
                init_std=cfg.initializer_range,
                policy=self.policy,
                name=f"upsampler_{i}",
            )(x)
            res = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
                out = ResidualBlock(
                    channels, rk, tuple(rd), cfg.leaky_relu_slope, self.policy, name=f"resblocks_{i * num_kernels + j}"
                )(x)
                res = out if res is None else res + out
            x = res / num_kernels

        x = nn.leaky_relu(x, cfg.leaky_relu_slope)
        x = PlainConv(1, 7, padding=3, init_std=cfg.initializer_range, policy=self.policy, name="conv_post")(x)
        wav = jnp.tanh(x)[..., 0]
        return self.policy.cast_to_output(wav)


def generator_apply_fused(
    params,
    config: HifiGanConfig,
    spectrogram: jax.Array,
    compute_dtype=jnp.bfloat16,
    force_fused: bool = False,
    interpret: bool = False,
    truncate: Optional[Tuple[str, int]] = None,
    mrf_fold: Optional[int] = None,
) -> jax.Array:
    """Inference-path generator forward with Pallas-fused MRF stages.

    Pure function over the standard ``HifiGanGenerator`` param tree (same
    checkpoints).  Per-branch dispatch is measurement-driven, and the
    *in-context* A/B on the whole vocoder is what decides (PARITY.md):
    standalone, the fused (C, T)-layout kernel wins every K=3 branch
    3.3-7.4x — but inside the jitted vocoder XLA fuses those branches with
    their neighbors and the standalone win evaporates; the full-vocoder A/B
    (xla-only 21.3 ms, C<=64 gate 17.1 ms, K==3-everywhere gate 20.2 ms,
    all-pallas 18.0 ms) keeps the C<=64 gate as the winner.  Wide stages
    fall back to XLA *by measurement*, not by VMEM necessity —
    ops/fused_mrf.py:pick_t_blk fits them when asked.
    Numerics match ``HifiGanGenerator.apply`` (tests/test_fused_mrf.py).

    ``truncate=("pre", 0) | ("up", i) | ("mrf", i)`` returns the raw
    activations right after conv_pre / upsampler i / stage i's MRF sum —
    benchmarks/bench_vocoder_stages.py rooflines the prefix deltas to
    attribute per-stage cost inside the real fused program.

    ``mrf_fold`` overrides the per-stage phase fold (ops/fused_mrf.py
    MRF_FOLD_TABLE otherwise): narrow stages fold `fold` time-phases into
    the MXU's output rows so the matmuls stop being C/128 row-starved.
    """
    from ..ops import fused_mrf as FM
    from ..ops.fused_mrf import (
        fold_time,
        fused_branch_fits,
        fused_stage_fits,
        mrf_branch_pallas,
        mrf_branch_reference,
        mrf_fold_for_channels,
        mrf_packing_for_channels,
        mrf_stage_pallas,
        unfold_time,
    )

    cfg = config
    cd = compute_dtype
    x = conv1d(
        spectrogram.astype(cd), params["conv_pre"]["kernel"].astype(cd), params["conv_pre"]["bias"].astype(cd), padding=3
    )
    if truncate == ("pre", 0):
        return x

    num_kernels = len(cfg.resblock_kernel_sizes)
    use_pallas_backend = force_fused or jax.default_backend() in ("tpu", "axon")
    for i, (rate, kernel) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        channels = cfg.upsample_initial_channel // (2 ** (i + 1))
        x = nn.leaky_relu(x, cfg.leaky_relu_slope)
        up = params[f"upsampler_{i}"]
        x = upsample_conv_transpose(x, up["kernel"].astype(cd), up["bias"].astype(cd), rate, (kernel - rate) // 2)
        if truncate == ("up", i):
            return x

        packing = mrf_packing_for_channels(channels)

        def _eligible(rk, rd, f):
            # channels <= 64 gate: in-context vocoder A/B, PARITY.md;
            # odd rk: the fused kernel assumes symmetric SAME padding
            return (
                use_pallas_backend
                and channels <= 64
                and rk % 2 == 1
                and fused_branch_fits(channels, rk, len(rd), tuple(rd), x.dtype.itemsize, fold=f, packing=packing)
            )

        # phase fold for the narrow stages (measured table, ops/fused_mrf.py):
        # fold once per stage and share the folded layout across the three
        # branches — the fold/unfold transposes happen 2x per stage, not 6x
        seq_len = x.shape[1]
        fold = mrf_fold if mrf_fold is not None else mrf_fold_for_channels(channels)
        branch_cfgs = list(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes))
        use_fold = fold > 1 and all(_eligible(rk, rd, fold) for rk, rd in branch_cfgs)

        def _branch_params(j, rd):
            bp = params[f"resblocks_{i * num_kernels + j}"]
            n_pairs = len(rd)
            w1 = jnp.stack([bp[f"convs1_{p}"]["kernel"] for p in range(n_pairs)]).astype(cd)
            b1 = jnp.stack([bp[f"convs1_{p}"]["bias"] for p in range(n_pairs)]).astype(cd)
            w2 = jnp.stack([bp[f"convs2_{p}"]["kernel"] for p in range(n_pairs)]).astype(cd)
            b2 = jnp.stack([bp[f"convs2_{p}"]["bias"] for p in range(n_pairs)]).astype(cd)
            return w1, b1, w2, b2

        # whole-stage fusion: every branch + the /num_kernels mean in one
        # kernel — one HBM read/write of the stage activation instead of
        # 3+4.  Measured NEUTRAL in the whole-vocoder A/B (the folded narrow
        # stages are not HBM-bound), so MRF_STAGE_FUSION ships False; the
        # gate stays for re-measurement (ops/fused_mrf.py, PARITY.md r4).
        stage_shapes = [(rk, tuple(rd)) for rk, rd in branch_cfgs]
        use_stage = (
            FM.MRF_STAGE_FUSION
            and use_pallas_backend
            and channels <= 64
            and all(rk % 2 == 1 for rk, _ in branch_cfgs)
            and fused_stage_fits(channels, stage_shapes, x.dtype.itemsize, fold=fold if use_fold else 1)
        )
        if use_stage:
            branches = [(*_branch_params(j, rd), tuple(rd)) for j, (rk, rd) in enumerate(branch_cfgs)]
            if use_fold:
                x = unfold_time(
                    mrf_stage_pallas(
                        fold_time(x, fold), branches, cfg.leaky_relu_slope,
                        interpret=interpret, fold=fold, prefolded_len=seq_len,
                    ),
                    fold,
                    seq_len,
                )
            else:
                x = mrf_stage_pallas(x, branches, cfg.leaky_relu_slope, interpret=interpret)
            if truncate == ("mrf", i):
                return x
            continue

        x_in = fold_time(x, fold) if use_fold else x
        res = None
        for j, (rk, rd) in enumerate(branch_cfgs):
            w1, b1, w2, b2 = _branch_params(j, rd)
            if use_fold:
                out = mrf_branch_pallas(
                    x_in,
                    w1,
                    b1,
                    w2,
                    b2,
                    tuple(rd),
                    cfg.leaky_relu_slope,
                    interpret=interpret,
                    fold=fold,
                    prefolded_len=seq_len,
                    packing=packing,
                )
            elif _eligible(rk, rd, 1):
                out = mrf_branch_pallas(x, w1, b1, w2, b2, tuple(rd), cfg.leaky_relu_slope, interpret=interpret)
            else:
                out = mrf_branch_reference(x, w1, b1, w2, b2, tuple(rd), cfg.leaky_relu_slope)
            res = out if res is None else res + out
        x = res / num_kernels
        if use_fold:
            x = unfold_time(x, fold, seq_len)
        if truncate == ("mrf", i):
            return x

    x = nn.leaky_relu(x, cfg.leaky_relu_slope)
    x = conv1d(x, params["conv_post"]["kernel"].astype(cd), params["conv_post"]["bias"].astype(cd), padding=3)
    return jnp.tanh(x)[..., 0].astype(jnp.float32)


# ---------------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------------


def _weight_norm(v: jax.Array, g: jax.Array) -> jax.Array:
    """w = g * v / ||v||, norm over all dims but the last (out channels) —
    torch weight_norm(dim=0) in our (K..., I, O) layout."""
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=axes, keepdims=True) + 1e-24)
    return (g.astype(jnp.float32) * v.astype(jnp.float32) / norm).astype(v.dtype)


class WNConv2d(nn.Module):
    """Weight-normalized Conv2d in NHWC (DiscriminatorP stacks)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        shape = (*self.kernel_size, in_ch, self.features)
        v = self.param("v", nn.initializers.he_normal(), shape, self.policy.param_dtype)
        g = self.param("g", nn.initializers.ones, (self.features,), self.policy.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.policy.param_dtype)
        w = _weight_norm(v, g)
        cd = self.policy.compute_dtype
        out = jax.lax.conv_general_dilated(
            x.astype(cd),
            w.astype(cd),
            self.strides,
            [(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(cd)


class WNConv1d(nn.Module):
    """Weight- or spectral-normalized Conv1d in NWC (DiscriminatorS stacks)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_spectral_norm: bool = False
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch // self.groups, self.features)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.policy.param_dtype)
        if self.use_spectral_norm:
            w_raw = self.param("kernel", nn.initializers.he_normal(), shape, self.policy.param_dtype)
            # power iteration on W viewed as (O, K*I), torch dim=0 semantics
            w_mat = w_raw.astype(jnp.float32).reshape(-1, self.features).T  # (O, K*I)
            u_var = self.variable(
                "spectral", "u", lambda: jax.random.normal(self.make_rng("params"), (self.features,), jnp.float32)
            )
            u = u_var.value
            v = w_mat.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u_new = w_mat @ v
            u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
            if update_stats and not self.is_initializing():
                u_var.value = jax.lax.stop_gradient(u_new)
            sigma = jnp.einsum("i,ij,j->", jax.lax.stop_gradient(u_new), w_mat, jax.lax.stop_gradient(v))
            w = (w_raw.astype(jnp.float32) / sigma).astype(w_raw.dtype)
        else:
            v_p = self.param("v", nn.initializers.he_normal(), shape, self.policy.param_dtype)
            g = self.param("g", nn.initializers.ones, (self.features,), self.policy.param_dtype)
            w = _weight_norm(v_p, g)
        cd = self.policy.compute_dtype
        return conv1d(x.astype(cd), w.astype(cd), bias.astype(cd), self.stride, 1, self.padding, self.groups)


class DiscriminatorP(nn.Module):
    """Period discriminator (hifigan/models.py:12-48): reshape waveform to
    (T/p, p) 2-D and run (5,1)-kernel strided conv stacks."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x):
        # x: (B, T) waveform
        b, t = x.shape
        pad = (-t) % self.period
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            t = t + pad
        h = x.reshape(b, t // self.period, self.period, 1)  # NHWC

        fmap = []
        get_pad = (5 * 1 - 1) // 2  # reference uses get_padding(5, 1) for every layer
        for i, ch in enumerate([32, 128, 512, 1024]):
            h = WNConv2d(
                ch, (self.kernel_size, 1), (self.stride, 1), (get_pad, 0), self.policy, name=f"convs_{i}"
            )(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = WNConv2d(1024, (self.kernel_size, 1), (1, 1), (2, 0), self.policy, name="convs_4")(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        h = WNConv2d(1, (3, 1), (1, 1), (1, 0), self.policy, name="conv_post")(h)
        fmap.append(h)
        return h.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, policy=self.policy, name=f"discriminators_{i}")
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


class DiscriminatorS(nn.Module):
    """Scale discriminator (hifigan/models.py:79-108)."""

    use_spectral_norm: bool = False
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        # x: (B, T)
        h = x[..., None]  # NWC
        specs = [
            (128, 15, 1, 7, 1),
            (128, 41, 2, 20, 4),
            (256, 41, 2, 20, 16),
            (512, 41, 4, 20, 16),
            (1024, 41, 4, 20, 16),
            (1024, 41, 1, 20, 16),
            (1024, 5, 1, 2, 1),
        ]
        fmap = []
        for i, (ch, k, s, p, g) in enumerate(specs):
            h = WNConv1d(ch, k, s, p, g, self.use_spectral_norm, self.policy, name=f"convs_{i}")(
                h, update_stats=update_stats
            )
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = WNConv1d(1, 3, 1, 1, 1, self.use_spectral_norm, self.policy, name="conv_post")(h, update_stats=update_stats)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


def _avg_pool_1d(x, window: int = 4, stride: int = 2, padding: int = 2):
    """torch AvgPool1d(count_include_pad=True) over (B, T)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window), (1, stride), [(0, 0), (padding, padding)]
    )
    return summed / window


class MultiScaleDiscriminator(nn.Module):
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, y, y_hat, update_stats: bool = False):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i in range(3):
            if i != 0:
                y = _avg_pool_1d(y)
                y_hat = _avg_pool_1d(y_hat)
            d = DiscriminatorS(use_spectral_norm=(i == 0), policy=self.policy, name=f"discriminators_{i}")
            o_r, f_r = d(y, update_stats=update_stats)
            o_g, f_g = d(y_hat, update_stats=update_stats)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


# ---------------------------------------------------------------------------
# GAN losses (hifigan/models.py:140-171)
# ---------------------------------------------------------------------------


def feature_loss(fmap_r, fmap_g) -> jax.Array:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
    return loss * 2


def discriminator_loss(real_outputs, generated_outputs):
    loss = 0.0
    for dr, dg in zip(real_outputs, generated_outputs):
        loss += jnp.mean((1 - dr.astype(jnp.float32)) ** 2) + jnp.mean(dg.astype(jnp.float32) ** 2)
    return loss


def generator_loss(generated_outputs):
    loss = 0.0
    for dg in generated_outputs:
        loss += jnp.mean((1 - dg.astype(jnp.float32)) ** 2)
    return loss
