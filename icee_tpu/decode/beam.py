"""Shape-stable beam search under ``jit``.

The reference's beam (``stylenet/model.py:198-294``, ``model_att.py:307-426``,
``app/backend/model.py`` serving copies) shrinks the live beam dynamically:
each step takes the top-``n_alive`` expansions, moves any that emit ``<end>``
into a "completed" list, and re-slices every tensor to the surviving beams —
shapes change every step, which cannot compile.

This implementation is a *proved-equivalent* masked formulation (equivalence
is tested against a NumPy transcription of the reference algorithm in
``tests/test_beam.py``):

- ``k`` slots are kept for the whole decode; a boolean ``alive`` mask and an
  ``n_alive`` counter replace slicing,
- dead slots contribute ``-inf`` rows to the expansion, so a flat top-``k``
  over ``(k, V)`` returns the reference's candidates in descending order;
  candidates ranked ``>= n_alive`` are exactly the ones the reference never
  materializes, and are invalidated by rank,
- completions scatter into a fixed ``(k,)`` completed buffer (the reference's
  total completions can never exceed the initial ``k`` because the live beam
  only shrinks), and ``n_alive`` decrements,
- step 1 reproduces the reference's special case (all slots identical, expand
  row 0 only: ``model.py:239-241``),
- termination, the empty-result fallback ``[<end>]`` (``model.py:288-289``)
  and best-completed selection by raw (un-normalized) score (``:291-293``)
  match the reference.

Serving-vs-research semantics: the stylenet research ``sample`` never feeds
the image feature into the LSTM (``model.py:224-227`` — a known bug), while
the serving copy feeds it as the step-1 input (``app/backend/model.py``).
Pass ``first_input`` for the serving semantics or ``None`` to reproduce the
research path; both are supported for checkpoint parity.

Batch over images with ``jax.vmap`` — the whole search is one jitted
``lax.while_loop``, so hundreds of images decode in parallel on one chip.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class BeamResult(NamedTuple):
    """Best sequence (including ``<start>`` at position 0 and ``<end>`` when
    present), its length, and its raw cumulative log-probability."""

    tokens: jax.Array   # (max_len,) int32, padded with end_token
    length: jax.Array   # () int32 — number of valid tokens incl. specials
    score: jax.Array    # () float32


class _State(NamedTuple):
    step: jax.Array
    n_alive: jax.Array
    scores: jax.Array          # (k,)
    seqs: jax.Array            # (k, L)
    seq_len: jax.Array         # () — tokens filled so far (same for all slots)
    prev_words: jax.Array      # (k,)
    model_state: object        # pytree with leading dim k per leaf
    n_completed: jax.Array
    comp_seqs: jax.Array       # (k+1, L) — row k is the dump row
    comp_lens: jax.Array       # (k+1,)
    comp_scores: jax.Array     # (k+1,)


def beam_search(
    embed_fn: Callable[[jax.Array], jax.Array],
    step_fn: Callable,
    init_model_state,
    start_token: int,
    end_token: int,
    k: int,
    max_seq_length: int,
    vocab_size: int,
    first_input: Optional[jax.Array] = None,
) -> BeamResult:
    """Run the reference beam search for ONE image (vmap for batches).

    ``step_fn(x, model_state) -> (logits (k, V), model_state)`` — the model
    step over ``k`` beam slots.  ``init_model_state`` leaves must have leading
    dim ``k``.  ``first_input``: optional (k, E) step-1 input (image feature,
    serving semantics).
    """
    max_len = max_seq_length + 2  # <start> + max_seq_length emissions + slack
    seqs0 = jnp.full((k, max_len), end_token, jnp.int32)
    seqs0 = seqs0.at[:, 0].set(start_token)

    state0 = _State(
        step=jnp.asarray(1, jnp.int32),
        n_alive=jnp.asarray(k, jnp.int32),
        scores=jnp.zeros((k,), jnp.float32),
        seqs=seqs0,
        seq_len=jnp.asarray(1, jnp.int32),
        prev_words=jnp.full((k,), start_token, jnp.int32),
        model_state=init_model_state,
        n_completed=jnp.asarray(0, jnp.int32),
        comp_seqs=jnp.full((k + 1, max_len), end_token, jnp.int32),
        comp_lens=jnp.zeros((k + 1,), jnp.int32),
        comp_scores=jnp.full((k + 1,), NEG_INF, jnp.float32),
    )

    rank = jnp.arange(k)

    def cond(s: _State):
        # reference: loop while beams remain, with the step check AFTER the
        # body ("if step > max_seq_length: break" post-work), i.e. the body
        # runs for step values 1..max_seq_length+1.
        return (s.n_alive > 0) & (s.step <= max_seq_length + 1)

    def body(s: _State) -> _State:
        is_first = s.step == 1
        x_emb = embed_fn(s.prev_words)
        if first_input is not None:
            x = jnp.where(is_first, first_input.astype(x_emb.dtype), x_emb)
        else:
            x = x_emb
        logits, model_state = step_fn(x, s.model_state)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        total = s.scores[:, None] + logp  # (k, V)

        # dead rows never compete; at step 1 only row 0 competes (model.py:239)
        alive_row = rank < s.n_alive
        row_ok = jnp.where(is_first, rank == 0, alive_row)
        total = jnp.where(row_ok[:, None], total, NEG_INF)

        top_scores, top_idx = jax.lax.top_k(total.reshape(-1), k)
        prev_idx = top_idx // vocab_size
        words = top_idx % vocab_size

        # candidates beyond the reference's top-n_alive (top-k at step 1)
        n_take = jnp.where(is_first, k, s.n_alive)
        valid = rank < n_take

        # extend sequences: candidate i inherits slot prev_idx[i]'s history
        new_seqs = s.seqs[prev_idx].at[:, s.seq_len].set(words)
        new_model_state = jax.tree_util.tree_map(
            lambda leaf: leaf[prev_idx], model_state
        )

        completed = valid & (words == end_token)
        still = valid & (words != end_token)

        # scatter completions into the fixed buffer (dump row k for others)
        comp_pos = jnp.where(
            completed, s.n_completed + jnp.cumsum(completed) - 1, k
        )
        comp_seqs = s.comp_seqs.at[comp_pos].set(new_seqs)
        comp_lens = s.comp_lens.at[comp_pos].set(s.seq_len + 1)
        comp_scores = s.comp_scores.at[comp_pos].set(top_scores)
        # restore the dump row to its sentinel
        comp_seqs = comp_seqs.at[k].set(jnp.full((max_len,), end_token, jnp.int32))
        comp_lens = comp_lens.at[k].set(0)
        comp_scores = comp_scores.at[k].set(NEG_INF)

        # compact survivors to the front (stable) so `rank < n_alive` indexing
        # keeps matching the reference's dense surviving-beam tensors
        order = jnp.argsort(~still)  # stable: survivors first, original order
        new_state = _State(
            step=s.step + 1,
            n_alive=jnp.sum(still).astype(jnp.int32),
            scores=jnp.where(still, top_scores, NEG_INF)[order],
            seqs=new_seqs[order],
            seq_len=s.seq_len + 1,
            prev_words=words[order],
            model_state=jax.tree_util.tree_map(
                lambda leaf: leaf[order], new_model_state
            ),
            n_completed=s.n_completed + jnp.sum(completed).astype(jnp.int32),
            comp_seqs=comp_seqs,
            comp_lens=comp_lens,
            comp_scores=comp_scores,
        )
        return new_state

    final = jax.lax.while_loop(cond, body, state0)

    best = jnp.argmax(final.comp_scores[:k])
    has_any = final.n_completed > 0
    # fallback: bare [<end>] sequence (model.py:288-289)
    fallback = jnp.full((max_len,), end_token, jnp.int32)
    tokens = jnp.where(has_any, final.comp_seqs[best], fallback)
    length = jnp.where(has_any, final.comp_lens[best], 1)
    score = jnp.where(has_any, final.comp_scores[best], NEG_INF)
    return BeamResult(tokens=tokens, length=length, score=score)
