"""Speech-to-unit encoder: HuBERT tower + k-means quantizer + dedup.

API parity with textlesslib's ``SpeechEncoder.by_name`` as the reference uses
it (/root/reference/src/flow_matching/utils/textless.py:9-21;
src/speechlm/tokenize.py:57-64): named (dense_model, quantizer, vocab_size)
combos, ``deduplicate`` flag, call on a waveform returns a dict with
``units`` (and ``durations`` when deduplicating).

Differences by design (TPU):
  * batched: accepts (B, T) padded waveforms + lengths and returns padded
    (B, N) unit arrays + unit counts — the per-utterance CUDA loop of
    preprocess.py:43-76 becomes one jitted program per bucket.
  * weights load from a local checkpoint directory (HF hub is unreachable
    from the TPU pod); ``by_name`` falls back to random init so the full
    pipeline stays runnable end-to-end for smoke tests.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Policy, BF16_INFERENCE
from ..ops.dedup import deduplicate_batch
from .hubert import HubertConfig, HubertEncoder
from .kmeans import KMeansQuantizer

# name -> (hubert config overrides, output layer) following textlesslib's
# model registry semantics (the layer the k-means codebook was fit on)
DENSE_MODELS: Dict[str, Dict] = {
    "hubert-base-ls960": {"config": HubertConfig(), "output_layer": 6},
    "mhubert-base-vp_mls_cv_8lang": {"config": HubertConfig(), "output_layer": 11},
    "mhubert-base-25hz": {"config": HubertConfig(), "output_layer": 11},
}

QUANTIZERS = {
    ("hubert-base-ls960", "kmeans", 50),
    ("hubert-base-ls960", "kmeans", 100),
    ("hubert-base-ls960", "kmeans", 200),
    ("mhubert-base-vp_mls_cv_8lang", "kmeans", 1000),
    ("mhubert-base-vp_mls_cv_8lang", "kmeans-expresso", 2000),
}


@dataclasses.dataclass
class SpeechEncoder:
    """waveform -> discrete units (+ durations when deduplicate=True)."""

    encoder: HubertEncoder
    variables: dict
    quantizer: KMeansQuantizer
    output_layer: int
    deduplicate: bool = False
    dense_model_name: str = ""
    quantizer_model_name: str = ""

    def __post_init__(self):
        self._encode_fn = jax.jit(self._encode, static_argnums=())

    @property
    def vocab_size(self) -> int:
        return self.quantizer.vocab_size

    def _encode(self, wav: jax.Array, num_samples=None) -> jax.Array:
        # num_samples threads exact mask discipline through the tower (masked
        # conv/group norms, zeroed pad features, masked attention) so padded
        # rows yield the same valid-frame units as unpadded per-row runs
        feats = self.encoder.apply(
            self.variables, wav, output_layer=self.output_layer, num_samples=num_samples
        )
        return self.quantizer(feats)

    def __call__(self, wav, lengths: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        """wav: (T,) or (B, T) 16 kHz waveform; lengths: optional (B,).

        Returns {"units": …, "durations": …, "num_units": …}; 1-D input gets
        1-D trimmed outputs (textlesslib call-convention parity).
        """
        wav = jnp.asarray(wav, jnp.float32)
        squeeze = wav.ndim == 1
        if squeeze:
            wav = wav[None]
        ns = None if lengths is None else jnp.asarray(lengths, jnp.int32)
        units = self._encode_fn(wav, ns)  # (B, N) frame-rate units

        cfg = self.encoder.config
        if lengths is not None:
            frame_lengths = jnp.asarray([cfg.num_frames(int(l)) for l in np.asarray(lengths)], jnp.int32)
        else:
            frame_lengths = jnp.full((wav.shape[0],), units.shape[1], jnp.int32)

        if self.deduplicate:
            deduped, durations, num = deduplicate_batch(units, frame_lengths)
            out = {"units": deduped, "durations": durations, "num_units": num}
        else:
            out = {"units": units, "durations": jnp.ones_like(units), "num_units": frame_lengths}

        if squeeze:
            n = int(out["num_units"][0])
            out = {"units": out["units"][0, :n], "durations": out["durations"][0, :n], "num_units": n}
        return out

    # -- construction --------------------------------------------------------

    @classmethod
    def by_name(
        cls,
        dense_model_name: str = "mhubert-base-vp_mls_cv_8lang",
        quantizer_model_name: str = "kmeans-expresso",
        vocab_size: int = 2000,
        deduplicate: bool = False,
        need_f0: bool = False,
        checkpoint_dir: Optional[str] = None,
        policy: Policy = BF16_INFERENCE,
        rng_seed: int = 0,
    ) -> "SpeechEncoder":
        """textlesslib-parity factory (textless.py:13-21 signature).

        ``checkpoint_dir``: directory holding ``<dense_model_name>.safetensors``
        (converted HF/fairseq weights) and
        ``<dense_model_name>-<quantizer_model_name>-<vocab>.npz`` k-means
        centers; defaults to $SPEECH_RESYNTH_MODELS or ./models/encoders.
        Missing files fall back to seeded random init (smoke-test mode).
        """
        if need_f0:
            raise NotImplementedError("f0 extraction is not part of the reference capability set")
        if dense_model_name not in DENSE_MODELS:
            raise KeyError(f"unknown dense model {dense_model_name!r}; have {sorted(DENSE_MODELS)}")

        spec = DENSE_MODELS[dense_model_name]
        config: HubertConfig = spec["config"]
        encoder = HubertEncoder(config, policy=policy)

        import os

        ckpt_dir = Path(checkpoint_dir or os.environ.get("SPEECH_RESYNTH_MODELS", "models/encoders"))
        dense_path = ckpt_dir / f"{dense_model_name}.safetensors"
        km_path = ckpt_dir / f"{dense_model_name}-{quantizer_model_name}-{vocab_size}.npz"

        if dense_path.is_file():
            from safetensors.numpy import load_file

            from .convert import hubert_params

            params = hubert_params(load_file(str(dense_path)))
            variables = {"params": policy.cast_params(params)}
        else:
            import warnings

            warnings.warn(
                f"no converted weights at {dense_path}; {dense_model_name} is RANDOMLY initialized "
                "(smoke-test mode). Convert the published checkpoint with scripts/convert_checkpoints.py.",
                stacklevel=2,
            )
            from ..core.flaxinit import jitted_init

            dummy = jnp.zeros((1, 4000), jnp.float32)
            variables = jitted_init(encoder, jax.random.key(rng_seed), dummy)

        if km_path.is_file():
            quantizer = KMeansQuantizer.load(km_path)
        else:
            import warnings

            warnings.warn(
                f"no k-means centers at {km_path}; using random centers (smoke-test mode).", stacklevel=2
            )
            key = jax.random.key(rng_seed + 1)
            centers = jax.random.normal(key, (vocab_size, config.hidden_size), jnp.float32)
            quantizer = KMeansQuantizer(centers)

        return cls(
            encoder=encoder,
            variables=variables,
            quantizer=quantizer,
            output_layer=spec["output_layer"],
            deduplicate=deduplicate,
            dense_model_name=dense_model_name,
            quantizer_model_name=quantizer_model_name,
        )


def load_encoder(
    dense_model_name: str = "mhubert-base-vp_mls_cv_8lang",
    quantizer_model_name: str = "kmeans-expresso",
    vocab_size: int = 2000,
    deduplicate: bool = False,
    **kwargs,
) -> SpeechEncoder:
    """Signature parity with utils/textless.py:9-21."""
    return SpeechEncoder.by_name(
        dense_model_name=dense_model_name,
        quantizer_model_name=quantizer_model_name,
        vocab_size=vocab_size,
        deduplicate=deduplicate,
        need_f0=False,
        **kwargs,
    )


def embedding(
    dense_model_name: str = "mhubert-base-vp_mls_cv_8lang",
    quantizer_model_name: str = "kmeans-expresso",
    vocab_size: int = 2000,
    checkpoint_dir: Optional[str] = None,
    rng_seed: int = 0,
) -> np.ndarray:
    """Frozen unit-embedding table from k-means centers with zero pad row
    (utils/textless.py:24-34 parity); shape (vocab+1, 768)."""
    enc = SpeechEncoder.by_name(
        dense_model_name, quantizer_model_name, vocab_size, checkpoint_dir=checkpoint_dir, rng_seed=rng_seed
    )
    return enc.quantizer.embedding_table()
