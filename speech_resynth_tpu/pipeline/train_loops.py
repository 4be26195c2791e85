"""Epoch-level training loops: CFM, HiFi-GAN, speech LM.

L4 orchestration (SURVEY.md §3.2/3.3/3.5) over the jitted trainers in
train/: datasets stream host batches, Orbax checkpoints every interval,
TensorBoard scalars, in-training validation.

Parity notes vs the reference:
* CFM (flow_matching/train.py:102-220): same optimizer/schedule/clip and
  20-epoch validation cadence — but OUR loop resumes from checkpoints (the
  reference saves and never loads, train.py:167).
* HiFi-GAN (hifigan/train.py:133-255): per-step D->G, per-epoch LR decay,
  periodic validation mel-L1 + audio logging.  ``training_files`` may be a
  tab-separated list OR the unit JSON (whose keys are utterance names).
* SpeechLM (speechlm/train.py:74-215): full resume, per-epoch dev sLM21
  scoring when the external ``zrc`` harness is installed.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..core.checkpoint import CheckpointManager
from ..core.mesh import distributed_init, dp_mesh_for_batch, host_local_copy, make_mesh, shard_batch
from ..core.metrics import MetricsWriter, StepTimer, mfu, step_flops, trace_span
from ..core.rng import RngStream
from ..models.cfm import CFMConfig
from ..models.hifigan import HifiGanConfig
from ..models.llama import LlamaConfig
from .data import MelDataset, UnitDataset, UnitTextDataset
from .prefetch import prefetch


def _mel_file_list(training_files: str) -> Optional[str]:
    """Accept the reference's MelDataset list format or a unit JSON."""
    path = Path(training_files)
    if path.suffix == ".json":
        with open(path) as f:
            names = list(json.load(f).keys())
        list_path = path.with_suffix(".filelist")
        # atomic write: multi-host training derives this file on every
        # process; a reader must never see another writer's partial output
        import os

        tmp = list_path.with_suffix(f".filelist.tmp{jax.process_index()}")
        tmp.write_text("\n".join(names) + "\n")
        os.replace(tmp, list_path)
        return str(list_path)
    return training_files


def validate_flow_matching(config, model, variables, step: int, writer: MetricsWriter, max_utts: int = 16) -> None:
    """In-training dev synthesis + WER/CER/MOS + audio logging
    (flow_matching/train.py:24-99 capability, with pluggable scorers).

    ``variables`` must be host-local (core.mesh.host_local_copy) — this runs
    rank-0-only eager compute that cannot touch multi-host global arrays."""
    from .scorers import default_asr, default_mos
    from ..text.normalize import cer, wer

    dev_set = UnitDataset(config.dataset.dev_file, wav_dir=config.dataset.wav_dir, ext_audio=config.dataset.ext_audio)
    if len(dev_set) == 0:
        return

    voc_path = Path(config.hifigan.path) if "hifigan" in config else None
    if not (voc_path and (voc_path / "config.json").is_file()):
        return  # no vocoder yet -> nothing scoreable; skip the dev sweep
    from ..models.composite import _load_state_dict
    from ..models.convert import hifigan_generator_buffers, hifigan_generator_params
    from ..models.hifigan import HifiGanGenerator

    with open(voc_path / "config.json") as f:
        voc_config = HifiGanConfig.from_dict(json.load(f))
    voc_sd = _load_state_dict(voc_path)
    vocoder = HifiGanGenerator(voc_config)
    vocoder_vars = {"params": jax.tree_util.tree_map(np.asarray, hifigan_generator_params(voc_sd))}
    if voc_config.normalize_before:
        vocoder_vars["buffers"] = jax.tree_util.tree_map(np.asarray, hifigan_generator_buffers(voc_sd))

    asr, mos = default_asr(config), default_mos(config)
    fm = config.flow_matching
    hyps, refs_text, hyp_scores, ref_scores = [], [], [], []
    done = 0
    for batch in dev_set.batches(min(8, max_utts), shuffle=False, drop_last=False):
        mels, mask = model.apply(
            variables,
            batch["input_ids"],
            dt=float(fm.dt),
            truncation_value=fm.get("truncation_value"),
            rng=jax.random.key(0),
            method="sample",
        )
        wavs = np.asarray(vocoder.apply(vocoder_vars, mels))
        lengths = np.asarray(voc_config.waveform_lengths(mask.sum(axis=1)))
        ref_wavs, ref_lengths = dev_set.wav_batch(batch["names"])
        hyp_list = [w[: int(n)] for w, n in zip(wavs, lengths)]
        hyp_scores += [mos.score(w) for w in hyp_list]
        ref_scores += [mos.score(w[: int(max(n, 0))]) for w, n in zip(ref_wavs, ref_lengths)]
        hyps += asr.transcribe(hyp_list)
        refs_text += batch["transcripts"]
        if done < 5:
            for j in range(min(len(hyp_list), 5 - done)):
                writer.audio(f"hyp/{batch['names'][j]}", hyp_list[j], step)
            done += len(hyp_list)
        if len(hyps) >= max_utts:
            break
    if hyps:
        writer.scalar("dev/WER", wer(refs_text, hyps), step)
        writer.scalar("dev/CER", cer(refs_text, hyps), step)
    if hyp_scores:
        writer.scalar("dev/MOS", float(np.mean(hyp_scores)), step)
        writer.scalar("dev/MOS (REF)", float(np.mean(ref_scores)), step)


def train_flow_matching(config) -> None:
    from ..models.speech_encoder import embedding as kmeans_embedding
    from ..train.cfm import CFMTrainerConfig, make_trainer

    distributed_init()  # multi-host no-op unless coordinator env is set
    fm = config.flow_matching
    mesh, batch_size = dp_mesh_for_batch(int(fm.batch_size))
    model_config = CFMConfig(
        vocab_size=fm.vocab_size,
        dim_in=fm.dim_in,
        dim_cond_emb=fm.dim_cond_emb,
        hidden_size=fm.hidden_size,
        depth=fm.depth,
        heads=fm.heads,
        intermediate_size=fm.intermediate_size,
        ff_dropout=fm.ff_dropout,
        use_unet_skip_connection=fm.use_unet_skip_connection,
        conv_pos_embed_kernel_size=fm.conv_pos_embed_kernel_size,
        conv_pos_embed_groups=fm.conv_pos_embed_groups,
        attn_dropout=fm.attn_dropout,
        mean=fm.mean,
        std=fm.std,
        predict_duration=fm.predict_duration,
        remat=bool(fm.get("remat") or False),  # optional memory knob, not a reference key
    )
    trainer_config = CFMTrainerConfig(
        batch_size=batch_size,
        frames_per_seg=fm.frames_per_seg,
        epoch=fm.epoch,
        warmup_steps=fm.warmup_steps,
        lr=fm.lr,
        lr_min=fm.lr_min,
        max_norm=fm.max_norm,
        summary_interval=fm.summary_interval,
        save_interval_epoch=fm.save_interval_epoch,
        seed=int(config.common.seed),
        accum_steps=int(fm.get("accum_steps") or 1),
    )

    train_set = UnitDataset(
        config.dataset.train_file,
        spectrogram_dir=config.dataset.spectrogram_dir,
        frames_per_seg=fm.frames_per_seg,
        ext_audio=config.dataset.ext_audio,
    )
    steps_per_epoch = max(len(train_set) // (trainer_config.batch_size), 1)
    total_steps = trainer_config.epoch * steps_per_epoch

    table = kmeans_embedding(fm.dense_model_name, fm.quantizer_model_name, fm.vocab_size)
    model, state, step_fn, _ = make_trainer(model_config, trainer_config, mesh, total_steps, table)

    path = Path(fm.path)
    writer = MetricsWriter(path / "logs")
    timer = StepTimer()
    flops_per_step = None
    rngs = RngStream(trainer_config.seed)

    with CheckpointManager(path / "ckpt") as ckpt:
        start_epoch = 1
        if ckpt.has_checkpoint():
            state = ckpt.restore(state)
            start_epoch = int(state.step) // steps_per_epoch + 1

        step = int(state.step)
        def _to_device(batch):
            arrays = {k: batch[k] for k in ("input_ids", "spectrogram_labels", "duration_labels")}
            return shard_batch(arrays, mesh)

        for epoch in range(start_epoch, trainer_config.epoch + 1):
            batches = train_set.batches(
                trainer_config.batch_size,
                seed=trainer_config.seed,
                epoch=epoch,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            )
            for sharded in prefetch(batches, transform=_to_device):
                with trace_span("cfm_train_step"):
                    state, metrics = step_fn(state, sharded, rngs.fold_in(step))
                if flops_per_step is None:  # post-step: AOT compile is a cache hit
                    flops_per_step = step_flops(step_fn, state, sharded, rngs.fold_in(step))
                step += 1
                timer.tick()
                if step % trainer_config.summary_interval == 0:
                    # scalars() materializes the metrics => a true device
                    # sync; rate from sync-to-sync wall time (dispatch-rate
                    # tick() overreads ~5x on the async tunneled backend)
                    writer.scalars({k: v for k, v in metrics.items()}, step, prefix="train/")
                    step_time = timer.synced_step_time(step)
                    if step_time:
                        writer.scalar("train/steps_per_sec", 1.0 / step_time, step)
                        if flops_per_step:
                            writer.scalar("train/MFU", mfu(flops_per_step, step_time), step)

            if epoch % trainer_config.save_interval_epoch == 0:
                # symmetric host-local copy first (collective when params are
                # cross-host sharded), THEN rank-gate the eager work — rank-0
                # jax compute on global arrays crashes/hangs multi-host runs
                local_vars = host_local_copy({"params": state.params, "buffers": state.extra})
                if jax.process_index() == 0:
                    try:
                        validate_flow_matching(config, model, local_vars, step, writer)
                    except FileNotFoundError:
                        pass
                ckpt.save(step, state)
                _export_cfm(config, model_config, local_vars)
    writer.close()


def _export_cfm(config, model_config, variables) -> None:
    """HF-format save_pretrained parity (flow_matching/train.py:210).
    Rank-0 only: concurrent writers corrupt the shared output dir."""
    if jax.process_index() != 0:
        return
    import dataclasses

    from ..models.export import cfm_state_dict, save_pretrained

    save_pretrained(
        Path(config.flow_matching.path) / "hf",
        cfm_state_dict(variables),
        dataclasses.asdict(model_config),
    )


def train_hifigan(config) -> None:
    from ..train.hifigan import HifiGanTrainerConfig, make_gan_trainer

    distributed_init()  # multi-host no-op unless coordinator env is set
    hg = config.hifigan
    mesh, gan_batch = dp_mesh_for_batch(int(hg.batch_size))
    defaults = HifiGanConfig()
    model_config = HifiGanConfig(
        upsample_rates=tuple(hg.upsample_rates),
        upsample_kernel_sizes=tuple(hg.upsample_kernel_sizes),
        upsample_initial_channel=hg.get("upsample_initial_channel", defaults.upsample_initial_channel),
        resblock_kernel_sizes=tuple(hg.get("resblock_kernel_sizes", defaults.resblock_kernel_sizes)),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in hg.get("resblock_dilation_sizes", defaults.resblock_dilation_sizes)
        ),
        normalize_before=False,
    )

    train_list = _mel_file_list(config.dataset.train_file)
    train_set = MelDataset(
        config.dataset.wav_dir,
        config.dataset.spectrogram_dir,
        train_list,
        hg.segment_size,
        hg.n_fft,
        hg.hop_size,
        True,
        config.dataset.ext_audio,
    )
    batch_size = gan_batch
    steps_per_epoch = max(len(train_set) // batch_size, 1)

    trainer_config = HifiGanTrainerConfig(
        batch_size=batch_size,
        segment_size=hg.segment_size,
        training_epochs=hg.training_epochs,
        learning_rate=hg.learning_rate,
        adam_b1=hg.adam_b1,
        adam_b2=hg.adam_b2,
        lr_decay=hg.lr_decay,
        seed=hg.seed,
        n_fft=hg.n_fft,
        hop_size=hg.hop_size,
        steps_per_epoch=steps_per_epoch,
        stdout_interval=hg.stdout_interval,
        summary_interval=hg.summary_interval,
        checkpoint_interval=hg.checkpoint_interval,
        validation_interval=hg.validation_interval,
    )
    models, state, step_fn = make_gan_trainer(model_config, trainer_config, mesh)

    path = Path(hg.path)
    writer = MetricsWriter(path / "logs")
    timer = StepTimer()
    flops_per_step = None
    with CheckpointManager(path / "ckpt") as ckpt:
        if ckpt.has_checkpoint():
            state = ckpt.restore(state)
        step = int(state.step)
        start_epoch = step // steps_per_epoch
        # exact mid-epoch resume: batches are deterministic in (seed, epoch),
        # so skip the ones already consumed before the checkpoint instead of
        # replaying them (the torch reference replays the whole epoch and its
        # per-epoch LR schedule drifts; ours stays step-exact)
        resume_skip = step - start_epoch * steps_per_epoch

        def _to_device(batch):
            arrays = {k: batch[k] for k in ("mel", "wav", "mel_mask")}
            return shard_batch(arrays, mesh)

        for epoch in range(start_epoch, trainer_config.training_epochs):
            batches = train_set.batches(
                batch_size,
                seed=trainer_config.seed,
                epoch=epoch,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            )
            if epoch == start_epoch and resume_skip:
                import itertools

                batches = itertools.islice(batches, resume_skip, None)
            for sharded in prefetch(batches, transform=_to_device):
                with trace_span("hifigan_train_step"):
                    state, metrics = step_fn(state, sharded)
                if flops_per_step is None:  # post-step: AOT compile is a cache hit
                    flops_per_step = step_flops(step_fn, state, sharded)
                step += 1
                timer.tick()
                if step % trainer_config.summary_interval == 0:
                    # sync-to-sync rate (see CFM loop note): scalars()
                    # materializes metrics, so this wall clock is honest
                    writer.scalars({k: v for k, v in metrics.items()}, step, prefix="training/")
                    # per-epoch exponential decay (train/hifigan.py schedule) —
                    # logged host-side so long-run reports get the LR curve.
                    # The update that produced this summary is optax count
                    # step-1 (first update sees schedule(0)).
                    writer.scalar(
                        "training/lr",
                        trainer_config.learning_rate
                        * trainer_config.lr_decay ** ((step - 1) // steps_per_epoch),
                        step,
                    )
                    step_time = timer.synced_step_time(step)
                    if step_time:
                        writer.scalar("training/steps_per_sec", 1.0 / step_time, step)
                        if flops_per_step:
                            writer.scalar("training/MFU", mfu(flops_per_step, step_time), step)
                if step % trainer_config.checkpoint_interval == 0:
                    ckpt.save(step, state)
                    _export_hifigan(config, model_config, host_local_copy(state.gen_params))
                if step % trainer_config.validation_interval == 0:
                    gen_local = host_local_copy(state.gen_params)  # symmetric
                    if jax.process_index() == 0:
                        _validate_hifigan(config, models[0], gen_local, trainer_config, step, writer)
        ckpt.save(step, state, force=True)
        _export_hifigan(config, model_config, host_local_copy(state.gen_params))
    writer.close()


def _export_hifigan(config, model_config, gen_params) -> None:
    """HF-format generator export (hifigan/train.py:199-201 parity): the
    saved directory loads with HF FastSpeech2ConformerHifiGan.
    Rank-0 only: concurrent writers corrupt the shared output dir."""
    if jax.process_index() != 0:
        return
    from ..models.export import hifigan_generator_state_dict, save_pretrained

    sd = hifigan_generator_state_dict(gen_params)
    save_pretrained(
        Path(config.hifigan.path),
        sd,
        {
            "model_type": "hifigan",
            "model_in_dim": model_config.model_in_dim,
            "upsample_initial_channel": model_config.upsample_initial_channel,
            "upsample_rates": list(model_config.upsample_rates),
            "upsample_kernel_sizes": list(model_config.upsample_kernel_sizes),
            "resblock_kernel_sizes": list(model_config.resblock_kernel_sizes),
            "resblock_dilation_sizes": [list(d) for d in model_config.resblock_dilation_sizes],
            "leaky_relu_slope": model_config.leaky_relu_slope,
            "normalize_before": model_config.normalize_before,
        },
    )


def _validate_hifigan(config, gen, gen_params, trainer_config, step: int, writer: MetricsWriter, max_utts: int = 32) -> None:
    """Dev mel-L1 + audio logging over FULL utterances
    (hifigan/train.py:225-252 validates whole files, split=False — cropped
    validation would make the mel-L1 curve incomparable with reference
    runs).  Utterances are bucketed by padded length (MelDataset
    .padded_batches) so each shape compiles once; the L1 is masked to real
    frames and averaged per-frame across the whole sweep.

    ``gen_params`` must be host-local (core.mesh.host_local_copy)."""
    from ..dsp.mel import log_mel_spectrogram

    dev_list = _mel_file_list(config.dataset.dev_file)
    dev_set = MelDataset(
        config.dataset.wav_dir,
        config.dataset.spectrogram_dir,
        dev_list,
        trainer_config.segment_size,
        trainer_config.n_fft,
        trainer_config.hop_size,
        False,  # full-length utterances
        config.dataset.ext_audio,
    )
    if len(dev_set) == 0:
        return
    abs_tot, frame_tot, logged = 0.0, 0, 0
    for batch in dev_set.padded_batches(8, max_utts=max_utts, with_wav=False):
        y_hat = gen.apply({"params": gen_params}, batch["mel"])
        y_hat_mel = log_mel_spectrogram(
            y_hat, n_fft=trainer_config.n_fft, num_mels=trainer_config.num_mels, hop_size=trainer_config.hop_size
        )
        diff = np.abs(np.asarray(y_hat_mel) - batch["mel"])
        mask = batch["mel_mask"][..., None]
        abs_tot += float((diff * mask).sum())
        frame_tot += int(mask.sum()) * diff.shape[-1]
        if logged == 0:
            for j in range(min(3, y_hat.shape[0])):
                true_frames = int(batch["mel_mask"][j].sum())
                true_len = (true_frames - 1) * trainer_config.hop_size + trainer_config.n_fft
                writer.audio(f"generated/y_hat_{j}", np.asarray(y_hat[j][:true_len]), step)
                writer.spectrogram_figure(
                    f"generated/y_hat_spec_{j}", np.asarray(y_hat_mel[j][:true_frames]).T, step
                )
            logged = 1
    if frame_tot:  # a zero-batch sweep must not log a fake-perfect 0.0
        writer.scalar("validation/mel_spec_error", abs_tot / frame_tot, step)


def train_speechlm(config) -> None:
    from ..train.speechlm import SpeechLMTrainerConfig, make_speechlm_trainer

    distributed_init()  # multi-host no-op unless coordinator env is set
    mesh = make_mesh()
    num_special = len(
        {
            t
            for t in (
                config.model.get("pad_token_id"),
                config.model.get("bos_token_id"),
                config.model.get("eos_token_id"),
            )
            if t is not None
        }
    )
    model_config = LlamaConfig(
        vocab_size=config.model.vocab_size + num_special,
        hidden_size=config.model.hidden_size,
        intermediate_size=config.model.intermediate_size,
        num_hidden_layers=config.model.num_hidden_layers,
        num_attention_heads=config.model.num_attention_heads,
        pad_token_id=config.model.get("pad_token_id") or 0,
        bos_token_id=config.model.get("bos_token_id"),
        eos_token_id=config.model.get("eos_token_id"),
    )
    trainer_config = SpeechLMTrainerConfig(
        batch_size_per_device=config.dataloader.batch_size_per_device,
        units_per_sample=config.dataset.units_per_sample,
        epoch=config.optim.epoch,
        warmup_steps=config.optim.warmup_steps,
        lr=config.optim.lr,
        lr_min=config.optim.lr_min,
        beta1=config.optim.beta1,
        beta2=config.optim.beta2,
        max_norm=config.optim.max_norm,
        summary_interval=config.optim.summary_interval,
        remat=bool(config.optim.get("remat") or False),  # optional memory knob
        accum_steps=int(config.optim.get("accum_steps") or 1),
    )

    train_set = UnitTextDataset(
        config.dataset.train_file,
        units_per_sample=trainer_config.units_per_sample,
        num_special_tokens=num_special,
        eos_token_id=config.model.eos_token_id,
    )
    global_batch = trainer_config.batch_size_per_device * jax.device_count()
    steps_per_epoch = max(len(train_set) // global_batch, 1)
    total_steps = trainer_config.epoch * steps_per_epoch

    model, state, step_fn, _ = make_speechlm_trainer(model_config, trainer_config, mesh, total_steps)

    path = Path(config.model.path)
    writer = MetricsWriter(path / "logs")
    timer = StepTimer()
    flops_per_step = None
    with CheckpointManager(path / "ckpt") as ckpt:
        start_epoch = 1
        if ckpt.has_checkpoint():
            state = ckpt.restore(state)
            start_epoch = int(state.step) // steps_per_epoch + 1

        step = int(state.step)
        for epoch in range(start_epoch, trainer_config.epoch + 1):
            batches = train_set.batches(
                global_batch,
                seed=trainer_config.seed,
                epoch=epoch,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
            )
            for sharded in prefetch(batches, transform=lambda b: shard_batch(b, mesh)):
                with trace_span("speechlm_train_step"):
                    state, metrics = step_fn(state, sharded)
                if flops_per_step is None:  # post-step: AOT compile is a cache hit
                    flops_per_step = step_flops(step_fn, state, sharded)
                step += 1
                timer.tick()
                if step % trainer_config.summary_interval == 0:
                    # sync-to-sync rate (see CFM loop note): scalars()
                    # materializes metrics, so this wall clock is honest
                    writer.scalars({k: v for k, v in metrics.items()}, step, prefix="train/")
                    writer.memory(step)  # HBM usage (reference logs CUDA peak, train.py:196-197)
                    step_time = timer.synced_step_time(step)
                    if step_time:
                        writer.scalar(
                            "train/tokens_per_sec",
                            global_batch * trainer_config.units_per_sample / step_time,
                            step,
                        )
                        if flops_per_step:
                            writer.scalar("train/MFU", mfu(flops_per_step, step_time), step)

            ckpt.save(step, state)
            # symmetric host-local copy (a COLLECTIVE when TP shards params
            # across hosts), then rank-0-only export/validation (train.py:211)
            local_params = host_local_copy(state.params)
            if jax.process_index() == 0:
                _export_speechlm(config, model_config, local_params)
                _validate_speechlm(config, model, {"params": local_params}, step, writer, num_special)
    writer.close()


def _export_speechlm(config, model_config, params) -> None:
    """HF-format LlamaForCausalLM export (speechlm/train.py:199-213 parity):
    the saved directory loads with HF transformers.  ``params`` host-local."""
    from ..models.export import llama_state_dict, save_pretrained

    sd = llama_state_dict(params)
    save_pretrained(
        Path(config.model.path) / "hf",
        sd,
        {
            "model_type": "llama",
            "architectures": ["LlamaForCausalLM"],
            "vocab_size": model_config.vocab_size,
            "hidden_size": model_config.hidden_size,
            "intermediate_size": model_config.intermediate_size,
            "num_hidden_layers": model_config.num_hidden_layers,
            "num_attention_heads": model_config.num_attention_heads,
            "num_key_value_heads": model_config.num_attention_heads,
            "rms_norm_eps": model_config.rms_norm_eps,
            "rope_theta": model_config.rope_theta,
            "tie_word_embeddings": False,
            "pad_token_id": model_config.pad_token_id,
            "bos_token_id": model_config.bos_token_id,
            "eos_token_id": model_config.eos_token_id,
            "torch_dtype": "float32",
        },
    )


def _validate_speechlm(config, model, variables, step, writer, num_special) -> None:
    """Per-epoch dev sLM21 scoring (speechlm/train.py:18-71)."""
    from .speechlm import aggregate_slm21_scores, run_zrc, write_scores

    result_dir = Path(config.dataset.result_dir)
    try:
        write_scores(
            model, variables, config.dataset.swuggy_dev_file, result_dir / "lexical/dev.txt",
            config.dataloader.batch_size_per_device, num_special,
        )
        write_scores(
            model, variables, config.dataset.sblimp_dev_file, result_dir / "syntactic/dev.txt",
            config.dataloader.batch_size_per_device, num_special,
        )
    except FileNotFoundError:
        return
    if run_zrc(result_dir, "dev"):
        df = aggregate_slm21_scores(result_dir, "dev")
        for name, value in df[0].items():
            writer.scalar(f"dev/{name}", value, step)


def eval_speechlm(config) -> None:
    from ..train.speechlm import SpeechLMTrainerConfig, make_speechlm_trainer
    from .speechlm import evaluate

    mesh = make_mesh()
    num_special = len(
        {
            t
            for t in (
                config.model.get("pad_token_id"),
                config.model.get("bos_token_id"),
                config.model.get("eos_token_id"),
            )
            if t is not None
        }
    )
    model_config = LlamaConfig(
        vocab_size=config.model.vocab_size + num_special,
        hidden_size=config.model.hidden_size,
        intermediate_size=config.model.intermediate_size,
        num_hidden_layers=config.model.num_hidden_layers,
        num_attention_heads=config.model.num_attention_heads,
        # keep special-token ids consistent with training's model_config
        pad_token_id=config.model.get("pad_token_id") or 0,
        bos_token_id=config.model.get("bos_token_id"),
        eos_token_id=config.model.get("eos_token_id"),
    )
    # "auto" (not the trainer's "xla" pin): this path only runs inference
    # scoring, where the flash forward keeps its measured win at 96x128
    # (+7%, bench_lm.py) — the XLA pin is a fused-fwd+bwd training verdict
    model, state, _, _ = make_speechlm_trainer(
        model_config, SpeechLMTrainerConfig(attn_implementation="auto"), mesh, total_steps=1
    )
    with CheckpointManager(Path(config.model.path) / "ckpt") as ckpt:
        state = ckpt.restore(state)
    return evaluate(config, model, {"params": state.params})


def generate_speechlm(
    config,
    prompt_wav: str,
    out_wav: str = None,
    decoder_dir: str = None,
    max_new_tokens: int = 128,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    seed: int = 0,
) -> dict:
    """Textless continuation stage: prompt wav -> units -> LM sampling ->
    units (-> waveform when a resynthesis decoder dir is given).

    Loads the trained speech-LM checkpoint exactly like ``eval_speechlm``
    and the BPE tokenizer from ``config.s2u.tokenizer_path``.  Returns the
    pipeline/generate.py result dict (plus writes ``out_wav`` if requested).
    Beyond the reference CLI surface — its speech LM never generates.
    """
    import jax

    from ..dsp import audio_io
    from ..train.speechlm import SpeechLMTrainerConfig, make_speechlm_trainer
    from ..tokenizers.bpe import BpeTokenizer
    from .generate import continue_speech, generate_unit_continuation
    from .speechlm import _make_encoder

    tokenizer = BpeTokenizer.from_file(config.s2u.tokenizer_path)
    num_special = len(
        {
            t
            for t in (
                config.model.get("pad_token_id"),
                config.model.get("bos_token_id"),
                config.model.get("eos_token_id"),
            )
            if t is not None
        }
    )
    model_config = LlamaConfig(
        vocab_size=config.model.vocab_size + num_special,
        hidden_size=config.model.hidden_size,
        intermediate_size=config.model.intermediate_size,
        num_hidden_layers=config.model.num_hidden_layers,
        num_attention_heads=config.model.num_attention_heads,
        pad_token_id=config.model.get("pad_token_id") or 0,
        bos_token_id=config.model.get("bos_token_id"),
        eos_token_id=config.model.get("eos_token_id"),
    )
    mesh = make_mesh()
    model, state, _, _ = make_speechlm_trainer(
        model_config, SpeechLMTrainerConfig(attn_implementation="auto"), mesh, total_steps=1
    )
    with CheckpointManager(Path(config.model.path) / "ckpt") as ckpt:
        state = ckpt.restore(state)
    variables = {"params": state.params}

    encoder = _make_encoder(config)
    wav, sr = audio_io.read(prompt_wav)
    out = encoder(wav.astype(np.float32))  # 1-D input -> squeezed 1-D units
    units = np.asarray(out["units"])

    kwargs = dict(
        max_new_tokens=max_new_tokens,
        eos_token_id=model_config.eos_token_id if model_config.eos_token_id is not None else 1,
        num_special_tokens=num_special,
        temperature=temperature,
        top_k=top_k,
        top_p=top_p,
        rng=jax.random.key(seed),
    )
    if decoder_dir is None:
        generated = generate_unit_continuation(units, tokenizer, model, variables, **kwargs)
        print(" ".join(str(u) for u in generated))
        return {"units": np.concatenate([units, generated]), "generated_units": generated, "waveform": None}

    from ..models.composite import ConditionalFlowMatchingWithHifiGan

    decoder = ConditionalFlowMatchingWithHifiGan.from_pretrained(decoder_dir)
    result = continue_speech(units, tokenizer, model, variables, decoder, **kwargs)
    if out_wav:
        audio_io.write(out_wav, result["waveform"], 16000)
        print(f"wrote {out_wav} ({result['waveform'].size / 16000:.2f}s, "
              f"{len(result['generated_units'])} new units)")
    return result
