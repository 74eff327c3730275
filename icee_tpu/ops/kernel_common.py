"""Shared policy helpers for the Pallas kernel modules.

Every training/decode kernel family resolves the same two questions the
same way; keeping the answers here means a change to the auto-interpret
rule or the batch-tile ladder lands in one place.
"""

import jax


def resolve_interpret(interpret):
    if interpret is None:  # auto: compile on TPU, interpret elsewhere
        return jax.default_backend() != "tpu"
    return interpret


def auto_batch_tile(b):
    """Largest tile from the ladder that divides ``b`` (whole-batch if
    b <= 128 or nothing divides)."""
    if b <= 128:
        return b
    for t in (128, 64, 32, 16, 8):
        if b % t == 0:
            return t
    return b
