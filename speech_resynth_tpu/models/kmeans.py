"""k-means: TPU Lloyd's training + framewise quantizer.

Capability parity with the sklearn ``MiniBatchKMeans`` models textlesslib
ships (``kmeans`` vocab 100, ``kmeans-expresso`` vocab 2000) whose
``cluster_centers_`` the reference consumes at
/root/reference/src/flow_matching/utils/textless.py:31-33 (frozen embedding)
and for framewise argmin assignment (textless.py:13-21).

TPU-first: both fit and inference are batched matmuls.  Assignment uses the
Pallas codebook kernel (ops/codebook.py) on TPU; the Lloyd update is a
one-hot matmul (frames x K^T) — MXU-shaped, no host scatter loops.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.codebook import assign, assign_reference


def _plusplus_init(rng: jax.Array, data: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding (matches sklearn's strategy, not byte-exact RNG)."""

    n = data.shape[0]
    first = jax.random.randint(rng, (), 0, n)
    centers0 = jnp.zeros((k, data.shape[1]), data.dtype).at[0].set(data[first])
    d2_0 = jnp.sum((data - centers0[0]) ** 2, axis=-1)

    def body(carry, i):
        centers, d2, key = carry
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        c = data[idx]
        centers = centers.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum((data - c) ** 2, axis=-1))
        return (centers, d2, key), ()

    (centers, _, _), _ = jax.lax.scan(body, (centers0, d2_0, rng), jnp.arange(1, k))
    return centers


def kmeans_fit(
    rng: jax.Array,
    data: jax.Array,
    k: int,
    iters: int = 50,
    init: str = "k-means++",
) -> Tuple[jax.Array, jax.Array]:
    """Lloyd's algorithm; returns (centers (k, D), inertia scalar)."""
    data = data.astype(jnp.float32)
    n, d = data.shape
    if init == "k-means++":
        centers = _plusplus_init(rng, data, k)
    else:
        idx = jax.random.choice(rng, n, (k,), replace=False)
        centers = data[idx]

    def step(centers, _):
        ids = assign_reference(data, centers)
        onehot = jax.nn.one_hot(ids, k, dtype=jnp.float32)  # (N, K)
        sums = onehot.T @ data  # (K, D) MXU matmul
        counts = jnp.sum(onehot, axis=0)[:, None]
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centers)
        return new_centers, ()

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    ids = assign_reference(data, centers)
    inertia = jnp.sum((data - centers[ids]) ** 2)
    return centers, inertia


@dataclasses.dataclass
class KMeansQuantizer:
    """Framewise nearest-center quantizer over (…, D) features."""

    centers: jax.Array  # (K, D)

    @property
    def vocab_size(self) -> int:
        return self.centers.shape[0]

    def __call__(self, features: jax.Array, implementation: str = "auto") -> jax.Array:
        return assign(features, self.centers, implementation=implementation)

    def embedding_table(self) -> np.ndarray:
        """Frozen embedding: zero pad row + centers (utils/textless.py:24-34);
        unit u maps to row u+1, padding id 0 to the zero row."""
        c = np.asarray(self.centers, np.float32)
        return np.concatenate([np.zeros((1, c.shape[1]), np.float32), c], axis=0)

    @classmethod
    def load(cls, path) -> "KMeansQuantizer":
        arr = np.load(path)
        centers = arr["centers"] if hasattr(arr, "files") else arr
        return cls(jnp.asarray(centers, jnp.float32))

    def save(self, path) -> None:
        np.savez(path, centers=np.asarray(self.centers, np.float32))
