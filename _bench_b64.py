import json, time
import jax, jax.numpy as jnp, numpy as np
from speech_resynth_tpu.core.precision import BF16_INFERENCE
from speech_resynth_tpu.models.cfm import CFMConfig
from speech_resynth_tpu.models.composite import ConditionalFlowMatchingWithHifiGan

decoder = ConditionalFlowMatchingWithHifiGan.from_config(CFMConfig(vocab_size=2000), policy=BF16_INFERENCE)
for batch in (32, 64):
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 2001, (batch, 500)), jnp.int32)
    run = lambda rng: decoder.synthesize(ids, dt=0.0625, truncation_value=1.0, rng=rng, pcm16=True)
    wav, lengths = run(jax.random.key(0)); np.asarray(wav)
    iters = 10
    t0 = time.perf_counter()
    outs = [run(jax.random.key(i + 1)) for i in range(iters)]
    for w, l in outs: np.asarray(w)
    el = time.perf_counter() - t0
    rtf = iters * float(jnp.sum(lengths)) / 16000.0 / el
    print(json.dumps({"batch": batch, "rtf": round(rtf, 1)}), flush=True)
