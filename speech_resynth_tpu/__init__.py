"""speech_resynth_tpu — a TPU-native textless speech framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
misternasty/speech_resynth reference stack (see /root/repo/SURVEY.md):

* speech resynthesis: waveform -> HuBERT/mHuBERT + k-means discrete units
  -> conditional-flow-matching log-mel decoder -> HiFi-GAN vocoder -> waveform
* speech language modeling: waveform -> deduplicated units -> unicode -> BPE
  -> Llama causal LM -> sWUGGY/sBLIMP scoring

Layering (bottom-up):
  core/      mesh + precision + rng + checkpoint + config + metrics
  dsp/       mel frontend, resampler, VAD trim, audio I/O
  ops/       Pallas kernels with lax reference implementations
  models/    Flax modules: CFM, transformer, HiFi-GAN, HuBERT, k-means, Llama
  parallel/  sharding rules over jax.sharding.Mesh
  train/     jit-compiled pjit trainers (CFM, HiFi-GAN GAN loop, speech LM)
  text/      unit<->unicode mapping, WER/CER text normalization
  tokenizers/ C++ BPE trainer/encoder with ctypes bindings
  pipeline/  batched device-resident preprocessing, synthesis, evaluation
  cli/       stage runners mirroring main_resynth.py / main_speechlm.py
"""

__version__ = "0.1.0"
