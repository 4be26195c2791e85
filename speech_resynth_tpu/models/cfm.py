"""Conditional flow matching mel decoder (Voicebox-style velocity field).

Behavior parity with the reference's ``ConditionalFlowMatchingModel``
(/root/reference/src/flow_matching/models.py:40-189):

* training: mel-normalize, sample x0~N(0,1) and t~U(0,1), linear OT path
  x_t=(1-t)x0 + t*x1 with target u_t = x1 - x0 (models.py:97-101), unit
  embedding condition, optional duration predictor + ground-truth length
  regulation + log-domain duration MSE (models.py:108-117), masked MSE loss.
* inference: fixed-step Euler ODE (models.py:172-184) — here a single
  ``lax.scan`` so all ODE steps compile into one XLA program; the truncation
  trick on x0 (models.py:168-170); pad frames filled with log(1e-5).

Static-shape discipline: the duration-expanded length at inference is data
dependent in torch (models.py:157-164); here callers pass a static
``max_frames`` bound and get a frame mask back (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.precision import Policy, DEFAULT
from ..dsp.mel import MEL_PAD_VALUE
from ..ops.length_regulator import regulate_length
from .transformer import ConvPositionEmbed, TimeConditionEmbed, Transformer, TransformerConfig


@dataclasses.dataclass(frozen=True)
class CFMConfig:
    """Mirrors ConditionalFlowMatchingConfig (src/flow_matching/configs.py:6-41)."""

    vocab_size: int = 2000
    dim_in: int = 80
    dim_cond_emb: int = 768
    hidden_size: int = 256
    depth: int = 4
    heads: int = 2
    intermediate_size: int = 896
    ff_dropout: float = 0.0
    use_unet_skip_connection: bool = False
    conv_pos_embed_kernel_size: int = 31
    conv_pos_embed_groups: int = 256
    attn_dropout: float = 0.0
    mean: float = -5.8843
    std: float = 2.2615
    predict_duration: bool = False
    # activation checkpointing for the transformer blocks (training memory
    # knob, not in the reference config schema — see TransformerConfig.remat)
    remat: bool = False

    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            hidden_size=self.hidden_size,
            depth=self.depth,
            heads=self.heads,
            intermediate_size=self.intermediate_size,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            use_unet_skip_connection=self.use_unet_skip_connection,
            conv_pos_embed_kernel_size=self.conv_pos_embed_kernel_size,
            conv_pos_embed_groups=self.conv_pos_embed_groups,
            remat=self.remat,
        )


LOG_DOMAIN_OFFSET = 1.0  # fastspeech/modules.py:90


class DurationPredictor(nn.Module):
    """Conv1d(dim_cond_emb -> 1, k=3): log-domain at train time, rounded
    linear-domain at inference (fastspeech/modules.py:76-107)."""

    dim_cond_emb: int
    policy: Policy = DEFAULT

    @nn.compact
    def __call__(self, hidden_states: jax.Array, train: bool) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (3, self.dim_cond_emb, 1), self.policy.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (1,), self.policy.param_dtype)
        out = jax.lax.conv_general_dilated(
            hidden_states.astype(jnp.float32),
            kernel.astype(jnp.float32),
            (1,),
            "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        out = (out + bias)[..., 0]  # (B, L) log-domain
        if train:
            return out
        return jnp.maximum(jnp.round(jnp.exp(out) - LOG_DOMAIN_OFFSET), 0.0).astype(jnp.int32)


class ConditionalFlowMatchingModel(nn.Module):
    config: CFMConfig
    policy: Policy = DEFAULT
    attn_implementation: str = "auto"

    def setup(self):
        cfg = self.config
        self.to_cond_emb = nn.Embed(
            cfg.vocab_size + 1, cfg.dim_cond_emb, param_dtype=self.policy.param_dtype, name="to_cond_emb"
        )
        self.time_cond_mlp = TimeConditionEmbed(cfg.hidden_size, self.policy, name="time_cond_mlp")
        self.to_embed = nn.Dense(
            cfg.hidden_size, param_dtype=self.policy.param_dtype, dtype=self.policy.compute_dtype, name="to_embed"
        )
        self.conv_embed = ConvPositionEmbed(
            cfg.hidden_size, cfg.conv_pos_embed_kernel_size, cfg.conv_pos_embed_groups, self.policy, name="conv_embed"
        )
        self.transformer = Transformer(cfg.transformer(), self.policy, self.attn_implementation, name="transformer")
        self.to_pred = nn.Dense(
            cfg.dim_in, use_bias=False, param_dtype=self.policy.param_dtype, dtype=self.policy.compute_dtype, name="to_pred"
        )
        if cfg.predict_duration:
            self.duration_predictor = DurationPredictor(cfg.dim_cond_emb, self.policy, name="duration_predictor")

    def _embed_units(self, input_ids: jax.Array) -> jax.Array:
        """Unit embedding with padding_idx=0 semantics (zeroed pad row)."""
        emb = self.to_cond_emb(input_ids)
        return jnp.where((input_ids != 0)[..., None], emb, 0)

    def _velocity(self, xt, cond, times, mask, deterministic=True):
        """One velocity-field evaluation v(x_t, cond, t)."""
        h = jnp.concatenate([xt.astype(self.policy.compute_dtype), cond.astype(self.policy.compute_dtype)], axis=-1)
        x = self.to_embed(h)
        x = self.conv_embed(x, mask=mask) + x
        time_emb = self.time_cond_mlp(times)
        x = self.transformer(x, mask=mask, time_cond=time_emb, deterministic=deterministic)
        return self.to_pred(x).astype(jnp.float32)

    def __call__(
        self,
        input_ids: jax.Array,
        spectrogram_labels: jax.Array,
        duration_labels: Optional[jax.Array] = None,
        *,
        rng: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, dict]:
        """Training loss (models.py:77-130 semantics). Returns (loss, aux)."""
        cfg = self.config
        mask = jnp.any(spectrogram_labels != -100, axis=-1)  # (B, N)
        batch, seq_len, _ = spectrogram_labels.shape
        x1 = (spectrogram_labels - cfg.mean) / cfg.std

        k_x0, k_t = jax.random.split(rng)
        x0 = jax.random.normal(k_x0, x1.shape, jnp.float32)
        times = jax.random.uniform(k_t, (batch,), jnp.float32)
        t = times[:, None, None]
        xt = (1 - t) * x0 + t * x1
        ut = x1 - x0

        cond = self._embed_units(input_ids)

        duration_loss = 0.0
        if cfg.predict_duration:
            assert duration_labels is not None
            dur_pred = self.duration_predictor(cond, train=True)  # (B, L) log-domain
            cond, _ = regulate_length(cond, duration_labels, seq_len)
            token_mask = input_ids != 0
            dur_target = jnp.log(duration_labels.astype(jnp.float32) + LOG_DOMAIN_OFFSET)
            sq = jnp.where(token_mask, (dur_pred - dur_target) ** 2, 0.0)
            duration_loss = jnp.sum(sq) / jnp.maximum(jnp.sum(token_mask), 1)

        pred = self._velocity(xt, cond, times, mask, deterministic=deterministic)
        sq = jnp.where(mask[..., None], (pred - ut) ** 2, 0.0)
        mse = jnp.sum(sq) / jnp.maximum(jnp.sum(mask) * cfg.dim_in, 1)
        return mse + duration_loss, {"mse": mse, "duration_loss": duration_loss}

    def predict_durations(self, input_ids: jax.Array) -> jax.Array:
        """Rounded per-token durations (B, L) int32, pad tokens zeroed.

        The cheap pre-pass callers run on the host to pick an exact static
        frame bound before jitting ``sample`` (reference models.py:157-164
        computes exact expanded lengths; XLA needs them static)."""
        cond = self._embed_units(input_ids)
        durations = self.duration_predictor(cond, train=False)
        return jnp.where(input_ids != 0, durations, 0)

    def sample(
        self,
        input_ids: jax.Array,
        dt: float = 0.1,
        truncation_value: Optional[float] = None,
        *,
        rng: Optional[jax.Array] = None,
        max_frames: Optional[int] = None,
        x0: Optional[jax.Array] = None,
        ode_method: str = "euler",
    ) -> Tuple[jax.Array, jax.Array]:
        """Fixed-step ODE mel synthesis (models.py:132-189 semantics).

        Returns (log_mels, frame_mask); pad frames hold log(1e-5).
        ``max_frames``: static output length when predict_duration expands the
        sequence.  When omitted in duration mode, the exact expanded length is
        used if durations are concrete (eager apply); under a jit trace that
        is impossible, so callers MUST pass ``max_frames`` (composite.py runs
        the ``predict_durations`` pre-pass to compute it) — a ValueError here
        beats the reference-diverging silent truncation.

        ``ode_method``: ``"euler"`` (reference parity, models.py:172-184; one
        velocity eval per step) or ``"midpoint"`` (explicit midpoint / RK2,
        two evals per step but second-order accurate — integrates the SAME
        trained flow to a given accuracy in about half the velocity evals;
        test-locked order + NFE-matched accuracy in tests/test_cfm.py).
        Beyond the reference capability set, which is Euler-only.
        """
        cfg = self.config
        token_mask = input_ids != 0
        cond = self._embed_units(input_ids)

        if cfg.predict_duration:
            durations = self.duration_predictor(cond, train=False)
            durations = jnp.where(token_mask, durations, 0)
            if max_frames is not None:
                out_len = max_frames
            else:
                total = jnp.sum(durations, axis=-1)
                try:
                    out_len = max(int(jnp.max(total)), 1)  # eager: exact, never truncates
                except jax.errors.ConcretizationTypeError as e:
                    raise ValueError(
                        "sample() under jit with predict_duration=True needs a static "
                        "max_frames; run predict_durations() on the host first "
                        "(see ConditionalFlowMatchingWithHifiGan.synthesize)"
                    ) from e
            cond, mask = regulate_length(cond, durations, out_len)
        else:
            mask = token_mask
            if max_frames is not None and max_frames != input_ids.shape[1]:
                raise ValueError("max_frames must equal input length when predict_duration=False")

        bsz, seq_len, _ = cond.shape
        if x0 is None:
            if rng is None:
                raise ValueError("sample() needs rng (or an explicit x0)")
            x0 = jax.random.normal(rng, (bsz, seq_len, cfg.dim_in), jnp.float32)
        if truncation_value is not None:
            x0 = jnp.clip(x0, -truncation_value, truncation_value)

        num_steps = int(np.ceil(round(1.0 / dt, 9)))
        step_times = jnp.arange(num_steps, dtype=jnp.float32) * dt

        if ode_method == "euler":

            def ode_step(mdl, xt, t):
                times = jnp.full((bsz,), t, jnp.float32)
                vt = mdl._velocity(xt, cond, times, mask)
                return xt + vt * dt, ()

        elif ode_method == "midpoint":

            def ode_step(mdl, xt, t):
                times = jnp.full((bsz,), t, jnp.float32)
                v1 = mdl._velocity(xt, cond, times, mask)
                vm = mdl._velocity(xt + v1 * (0.5 * dt), cond, times + 0.5 * dt, mask)
                return xt + vm * dt, ()

        else:
            raise ValueError(f"unknown ode_method {ode_method!r} (euler|midpoint)")

        # lifted scan: all ODE steps compile into one XLA while-program
        xt, _ = nn.scan(
            ode_step,
            variable_broadcast=["params", "buffers"],
            split_rngs={"params": False},
        )(self, x0, step_times)

        x1 = xt * cfg.std + cfg.mean
        x1 = jnp.where(mask[..., None], x1, MEL_PAD_VALUE)
        return x1, mask
