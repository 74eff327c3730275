"""SentiCap beam search: length-normalized log2 beams.

Parity target: ``decoder_beamsearch`` / ``decoder_beamsearch_with_attention``
(``mrnn_algorithms.py:113-209``):

- scores are ``-log2 p`` accumulated per word; the live beam is pruned by
  length-normalized score ``lp / c`` each step,
- a sequence completes on token 0 (STOP) or at length 20; completed results
  carry the final length-normalized score; the best (lowest) wins,
- the switched variant also records the per-step switch gate values for
  test-time highlighting (``train_joint.py``'s HTML output).

Host-driven loop around the jitted ``one_step`` (the reference drives its
compiled ``one_step`` per beam per token; here all live beams advance in one
batched device call per step).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def beam_decode(
    one_step_fn,
    v: np.ndarray,
    beam_size: int = 20,
    max_len: int = 20,
    stop_token: int = 0,
    with_attention: bool = False,
):
    """-> (best_norm_log2prob, token_list, [attention_trace]).

    ``one_step_fn(words (B,), use_v (), h, c) -> (s_t (B, V), h, c[, att])``
    with state leaves batched over live beams; first call is made with the
    visual flag set and a dummy word.
    """
    import jax.numpy as jnp

    # step 0: visual input
    out = one_step_fn(np.zeros((1,), np.int32), True, None, None)
    s_t, h, c = out[0], out[1], out[2]
    att0 = out[3] if with_attention else None

    # beam entries: (norm_lp, lp, count, words, row, att_trace)
    beams = [(0.0, 0.0, 0, [], 0, [])]
    state_h, state_c = np.asarray(h), np.asarray(c)
    probs = np.asarray(s_t)
    results: List[Tuple[float, int, List[int], List[float]]] = []

    for _ in range(max_len + 1):
        candidates = []
        for norm_lp, lp, cnt, words, row, att_tr in beams:
            all_lp = -np.log2(probs[row] + 1e-37)
            best_idx = np.argsort(all_lp)[:beam_size]
            att_here = (float(np.asarray(att0)[row, 0])
                        if with_attention and att0 is not None else None)
            for i in best_idx:
                new_lp = lp + float(all_lp[i])
                new_words = words + [int(i)]
                new_att = att_tr + ([att_here] if att_here is not None else [])
                if i == stop_token or cnt == max_len:
                    results.append((new_lp / (cnt + 1), cnt + 1, new_words,
                                    new_att))
                else:
                    candidates.append((new_lp / (cnt + 1), new_lp, cnt + 1,
                                       new_words, row, new_att))
        candidates.sort(key=lambda x: x[0])
        candidates = candidates[:beam_size]
        if not candidates:
            break
        # advance all surviving beams in one batched device step
        rows = np.asarray([c_[4] for c_ in candidates])
        words_in = np.asarray([c_[3][-1] for c_ in candidates], np.int32)
        h_in = state_h[rows]
        c_in = state_c[rows]
        out = one_step_fn(words_in, False, h_in, c_in)
        probs = np.asarray(out[0])
        state_h, state_c = np.asarray(out[1]), np.asarray(out[2])
        att0 = out[3] if with_attention else None
        beams = [(c_[0], c_[1], c_[2], c_[3], j, c_[5])
                 for j, c_ in enumerate(candidates)]

    results.sort(key=lambda x: x[0])
    best = results[0]
    if with_attention:
        return best[0], best[2], best[3]
    return best[0], best[2]
