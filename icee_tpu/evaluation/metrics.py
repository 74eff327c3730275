"""Training/validation metrics with packed-semantics parity.

The reference computes every loss/metric over the *packed* token stream
(``CrossEntropyLoss`` default mean over tokens, ``train_multitask.py:300``;
top-5 accuracy over packed positions, ``utils.py:127-140``).  Our batches are
fixed-shape padded tensors, so each metric here is mask-weighted with exactly
the packed normalization: sum over valid positions / number of valid tokens.

All functions are jit-friendly pure JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def length_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths -> (B, T) bool validity mask (t < length)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def masked_cross_entropy(
    logits: jax.Array,     # (B, T, V)
    targets: jax.Array,    # (B, T) int
    lengths: jax.Array,    # (B,)
    sample_mask: jax.Array | None = None,  # (B,) bool, batch padding
) -> jax.Array:
    """Token-mean CE == torch ``CrossEntropyLoss()(packed_logits, packed_tgts)``."""
    mask = length_mask(lengths, logits.shape[1])
    if sample_mask is not None:
        mask = mask & sample_mask[:, None]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom


def masked_top_k_accuracy(
    logits: jax.Array,
    targets: jax.Array,
    lengths: jax.Array,
    k: int = 5,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """Top-k token accuracy in percent over valid tokens (utils.py:127-140)."""
    mask = length_mask(lengths, logits.shape[1])
    if sample_mask is not None:
        mask = mask & sample_mask[:, None]
    _, top_idx = jax.lax.top_k(logits, k)           # (B, T, k)
    correct = jnp.any(top_idx == targets[..., None], axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return 100.0 * jnp.sum(jnp.where(mask, correct, False)) / denom


def perplexity(mean_loss) -> float:
    """np.exp of the token-mean CE (``train_multitask.py:212``)."""
    return float(np.exp(float(mean_loss)))


class AverageMeter:
    """Running val/avg/sum/count tracker (reference ``utils.py:93-111``)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
