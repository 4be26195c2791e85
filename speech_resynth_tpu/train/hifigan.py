"""HiFi-GAN GAN trainer (data-parallel pjit, two optimizers in one step).

Semantics parity with /root/reference/src/hifigan/train.py:133-255:
  * per step: D update first (LSGAN on MPD+MSD with the generator output
    detached), then G update (mel-L1 x45 + feature-matching x2 + adversarial)
    against the *updated* discriminators — matching torch execution order.
  * AdamW betas (0.8, 0.99), ExponentialLR gamma 0.999 stepped per *epoch*
    (train.py:70-91,258-259).
  * in-training mel_spectrogram of the generated waveform (train.py:152).

TPU-native differences: both phases compile into ONE XLA program (no
host-side optimizer hooks), AMP GradScalers are gone (bf16/f32 policy), and
mp.spawn/DDP becomes the data-axis mesh — gradients all-reduce over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.precision import Policy, DEFAULT
from ..dsp.mel import log_mel_spectrogram
from .common import make_optimizer
from ..models.hifigan import (
    HifiGanConfig,
    HifiGanGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


@dataclasses.dataclass
class HifiGanTrainerConfig:
    # NOTE: no accum_steps here by design — CFM/speech-LM expose gradient
    # accumulation (train/common.py make_optimizer), but the GAN step
    # interleaves D and G updates against *freshly updated* discriminators
    # inside one program (reference hifigan/train.py per-step D->G order);
    # accumulating either side would change those adversarial dynamics, so
    # scale GAN batch via data parallelism instead.
    batch_size: int = 64
    segment_size: int = 16080
    training_epochs: int = 181
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999
    seed: int = 1234
    n_fft: int = 400
    hop_size: int = 320
    num_mels: int = 80
    steps_per_epoch: int = 5543  # 354729 / 64; overridden by the pipeline
    stdout_interval: int = 1000
    summary_interval: int = 1000
    checkpoint_interval: int = 10000
    validation_interval: int = 10000
    mel_loss_weight: float = 45.0


class GanTrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any
    disc_params: Any  # {"mpd": …, "msd": …}
    disc_state: Any  # spectral-norm power-iteration vectors
    gen_opt: Any
    disc_opt: Any


def epoch_exponential_schedule(lr: float, gamma: float, steps_per_epoch: int):
    """lr * gamma^epoch, stepped per epoch (ExponentialLR parity)."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // max(steps_per_epoch, 1)
        return lr * gamma ** epoch.astype(jnp.float32)

    return schedule


def build_models(
    config: HifiGanConfig, trainer: HifiGanTrainerConfig, policy: Policy = DEFAULT, seed: int = 0
):
    gen = HifiGanGenerator(config, policy=policy)
    mpd = MultiPeriodDiscriminator(policy=policy)
    msd = MultiScaleDiscriminator(policy=policy)

    mel = jnp.zeros((1, 16, config.model_in_dim), jnp.float32)
    wav = jnp.zeros((1, 16 * config.total_upsample + (400 - config.total_upsample)), jnp.float32)
    from ..core.flaxinit import jitted_init

    gen_vars = jitted_init(gen, jax.random.key(seed), mel)
    mpd_vars = jitted_init(mpd, jax.random.key(seed + 1), wav, wav)
    msd_vars = jitted_init(msd, jax.random.key(seed + 2), wav, wav)
    return (gen, mpd, msd), (gen_vars, mpd_vars, msd_vars)


def make_gan_trainer(
    config: HifiGanConfig,
    trainer: HifiGanTrainerConfig,
    mesh: Mesh,
    policy: Policy = DEFAULT,
):
    """Returns (state, step_fn). Batch: {"mel": (B,T,80) f32, "wav": (B,S)
    f32, "mel_mask": (B,T) bool}."""
    (gen, mpd, msd), (gen_vars, mpd_vars, msd_vars) = build_models(config, trainer, policy, trainer.seed)

    schedule = epoch_exponential_schedule(trainer.learning_rate, trainer.lr_decay, trainer.steps_per_epoch)
    # torch.optim.AdamW defaults (reference hifigan/train.py:70-75 passes only
    # lr/betas): weight_decay 0.01, eps 1e-8, and NO gradient clipping.  Routed
    # through make_optimizer so optimizer parity lives in one place.
    gen_tx = make_optimizer(
        schedule, b1=trainer.adam_b1, b2=trainer.adam_b2, eps=1e-8, max_norm=None, weight_decay=0.01
    )
    disc_tx = make_optimizer(
        schedule, b1=trainer.adam_b1, b2=trainer.adam_b2, eps=1e-8, max_norm=None, weight_decay=0.01
    )

    disc_params = {"mpd": mpd_vars["params"], "msd": msd_vars["params"]}
    disc_state = {"msd": msd_vars.get("spectral", {})}

    state = GanTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_vars["params"],
        disc_params=disc_params,
        disc_state=disc_state,
        gen_opt=gen_tx.init(gen_vars["params"]),
        disc_opt=disc_tx.init(disc_params),
    )
    state = jax.device_put(state, NamedSharding(mesh, P()))

    mel_kw = dict(n_fft=trainer.n_fft, num_mels=trainer.num_mels, hop_size=trainer.hop_size)

    def run_discs(dparams, dstate, y, y_hat, update_stats):
        mpd_out = mpd.apply({"params": dparams["mpd"]}, y, y_hat)
        msd_vars_in = {"params": dparams["msd"], "spectral": dstate["msd"]}
        if update_stats:
            (msd_out), new_spec = msd.apply(
                msd_vars_in, y, y_hat, update_stats=True, mutable=["spectral"]
            )
            return mpd_out, msd_out, {"msd": new_spec["spectral"]}
        msd_out = msd.apply(msd_vars_in, y, y_hat)
        return mpd_out, msd_out, dstate

    def step_fn(state: GanTrainState, batch):
        mel, wav, mel_mask = batch["mel"], batch["wav"], batch["mel_mask"]

        # generator forward once (detached for the D step)
        y_hat = gen.apply({"params": state.gen_params}, mel)
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        # ---- discriminator update (train.py:154-167) ----
        def d_loss_fn(dparams):
            (mpd_r, mpd_g, _, _), (msd_r, msd_g, _, _), new_dstate = run_discs(
                dparams, state.disc_state, wav, y_hat_sg, update_stats=True
            )
            loss = discriminator_loss(mpd_r, mpd_g) + discriminator_loss(msd_r, msd_g)
            return loss, new_dstate

        (loss_d, new_dstate), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.disc_params)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- generator update against updated discriminators (train.py:170-185) ----
        def g_loss_fn(gparams):
            y_g = gen.apply({"params": gparams}, mel)
            y_g_mel = log_mel_spectrogram(y_g, **mel_kw)
            diff = jnp.abs(mel - y_g_mel)
            mel_l1 = jnp.sum(jnp.where(mel_mask[..., None], diff, 0.0)) / jnp.maximum(
                jnp.sum(mel_mask) * trainer.num_mels, 1
            )
            (mpd_r, mpd_g, fr_f, fg_f), (msd_r, msd_g, fr_s, fg_s), _ = run_discs(
                disc_params, new_dstate, wav, y_g, update_stats=False
            )
            loss = (
                generator_loss(mpd_g)
                + generator_loss(msd_g)
                + feature_loss(fr_f, fg_f)
                + feature_loss(fr_s, fg_s)
                + trainer.mel_loss_weight * mel_l1
            )
            return loss, mel_l1

        (loss_g, mel_error), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            disc_state=new_dstate,
            gen_opt=gen_opt,
            disc_opt=disc_opt,
        )
        metrics = {"loss_disc": loss_d, "loss_gen": loss_g, "mel_error": mel_error}
        return new_state, metrics

    return (gen, mpd, msd), state, jax.jit(step_fn, donate_argnums=(0,))
