"""Pallas TPU mega-kernel: the ENTIRE FactoredLSTM beam search in one launch.

Round-1 ran the beam loop as an XLA ``while_loop`` over per-step
``pallas_call``s (``ops/pallas_decode.py``).  Profiling showed the weights
(~15 MB: C, S, U, W, V, embedding) being re-fetched from HBM on every one of
the 41 step launches (~620 MB/decode ~ 0.75 ms/step at HBM bandwidth vs
~0.45 ms of MXU compute) — 4-10x above the compute roofline.

This kernel runs the WHOLE search — cell, vocab-tiled head, streaming exact
top-k + logsumexp, beam selection, state gather, sequence bookkeeping,
best-completed tracking, and the next-token embedding lookup — inside a
single ``pallas_call`` with grid ``(row_blocks, steps)``:

- every weight block has a constant index map, so Mosaic DMAs each weight
  from HBM ONCE per launch and keeps it VMEM-resident across all steps,
- h/c/x/sequences live in VMEM scratch across the step dimension,
- rows are laid out *beam-major per block* (row ``p*n_img + i`` = beam slot
  ``p`` of image ``i``), so all per-image beam work (candidate merge, state
  gather by parent slot, best-row select) is static slices + masked sums —
  no dynamic gathers, which Mosaic cannot lower (probed),
- the next-input embedding is a one-hot matmul ``onehot(words) @ Emb`` in
  vocab tiles (exact: a single 1.0 in bf16 reproduces the embedding row
  bit-for-bit in f32 accumulation),
- an SMEM ``done`` flag skips remaining step iterations once every beam in
  the block has completed (the reference's early loop exit).

Semantics are the masked beam of ``decode/beam.py:beam_search_batched``
(itself proved equivalent to the reference ``stylenet/model.py:198-294``):
step-1 single-row special case, rank<n_alive candidate validity, strict->
best-completed tracking with list-order tie-break, ``[<end>]`` fallback,
and both serving (``feed_feature=True``, feature as step-1 input:
``app/backend/model.py``) and research (feature ignored:
``model.py:224-227``) modes.  Token-exact equivalence against the XLA beam
is tested in ``tests/test_pallas_beam.py`` (interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icee_tpu.decode.beam import BeamResult
from icee_tpu.ops.pallas_decode import (NEG, _merge_topk, _row_topk,
                                        _row_topk_fold)

BIG = 2**30  # tie-break sentinel (any value > every candidate index)


def _kernel(feat_ref, emb_ref,
            vw_ref, vb_ref, sw_ref, sb_ref, uw_ref, ub_ref, ww_ref, wb_ref,
            cw_ref, cb_ref,
            tok_ref, len_ref, score_ref,
            h_scr, c_scr, x_scr, seqs_scr, scores_scr, alive_scr, done_scr,
            *, k: int, n_img: int, f_dim: int, h_dim: int, e_dim: int,
            v_tile: int, vocab: int, max_len: int, start_token: int,
            end_token: int, feed_feature: bool, n_streams: int = 1,
            cell: str = "factored", profile: str = "full",
            topk_fold: bool = False):
    # ``profile`` is a perf-diagnosis knob ("full" in production): "no_topk"
    # stubs the streaming vocab top-k, "no_select" the beam-select/gather
    # phase, "no_embed" the one-hot embedding matmul.  Each stub keeps the
    # remaining phases data-dependent so nothing is dead-code-eliminated.
    #
    # ``n_streams=2`` splits each block into two independent image halves
    # and interleaves their phases — stream A's top-k / beam-select (VPU)
    # is issued adjacent to stream B's head / embedding matmuls (MXU), which
    # the Mosaic scheduler overlaps (probed: independent MXU+VPU chains run
    # at ~max() rather than sum()).
    t = pl.program_id(1)
    rows = n_img * k
    n2 = n_img // n_streams          # images per stream
    rows2 = n2 * k
    n_vt = vocab // v_tile
    wdt = cw_ref.dtype
    # fold top-k needs a power-of-two tile wider than the 128-lane remainder
    use_fold = topk_fold and v_tile > 128 and (v_tile & (v_tile - 1)) == 0
    topk_fn = _row_topk_fold if use_fold else _row_topk

    @pl.when(t == 0)
    def _init():
        col_l = jax.lax.broadcasted_iota(jnp.int32, (rows, max_len), 1)
        seqs_scr[:] = jnp.where(col_l == 0, start_token, end_token)
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        if feed_feature:
            x_scr[:] = feat_ref[:].astype(jnp.float32)
        else:
            # research semantics: step 1 embeds <start> (model.py:224-227)
            x_scr[:] = jnp.broadcast_to(
                emb_ref[start_token, :].astype(jnp.float32), (rows, e_dim))
        scores_scr[:] = jnp.zeros_like(scores_scr)
        alive_scr[:] = jnp.ones_like(alive_scr)
        tok_ref[:] = jnp.full_like(tok_ref, end_token)
        len_ref[:] = jnp.ones_like(len_ref)       # fallback [<end>] length
        score_ref[:] = jnp.full_like(score_ref, NEG)
        done_scr[0, 0] = 0

    @pl.when(done_scr[0, 0] == 0)
    def _step():
        is_first = t == 0
        x = x_scr[:].astype(wdt)
        h = h_scr[:].astype(wdt)
        c = c_scr[:]

        if cell == "factored":
            # --- FactoredLSTM cell (reference quirk h=o*c, model.py:153) ---
            v_all = jnp.dot(x, vw_ref[:], preferred_element_type=jnp.float32)
            w_all = jnp.dot(h, ww_ref[:], preferred_element_type=jnp.float32)
            z = []
            for g in range(4):
                v_g = v_all[:, g * f_dim:(g + 1) * f_dim] + vb_ref[g, :]
                s_g = jnp.dot(v_g.astype(wdt), sw_ref[g],
                              preferred_element_type=jnp.float32) + sb_ref[g, :]
                u_g = jnp.dot(s_g.astype(wdt), uw_ref[g],
                              preferred_element_type=jnp.float32) + ub_ref[g, :]
                z.append(u_g + w_all[:, g * h_dim:(g + 1) * h_dim]
                         + wb_ref[g, :])
            i_t = jax.nn.sigmoid(z[0])
            f_t = jax.nn.sigmoid(z[1])
            o_t = jax.nn.sigmoid(z[2])
            g_t = jnp.tanh(z[3])
            c_new = f_t * c + i_t * g_t
            h_new = o_t * c_new
        else:
            # --- torch LSTMCell (NIC, nic/model.py:51): vw/ww carry
            # W_ih/W_hh, vb/wb carry b_ih/b_hh as (1, 4H); gate order
            # [i, f, g, o]; h = o * tanh(c) — same float order as
            # ops/cells.lstm_cell
            z = (jnp.dot(x, vw_ref[:], preferred_element_type=jnp.float32)
                 + vb_ref[0, :]
                 + jnp.dot(h, ww_ref[:], preferred_element_type=jnp.float32)
                 + wb_ref[0, :])
            i_t = jax.nn.sigmoid(z[:, 0 * h_dim:1 * h_dim])
            f_t = jax.nn.sigmoid(z[:, 1 * h_dim:2 * h_dim])
            g_t = jnp.tanh(z[:, 2 * h_dim:3 * h_dim])
            o_t = jax.nn.sigmoid(z[:, 3 * h_dim:4 * h_dim])
            c_new = f_t * c + i_t * g_t
            h_new = o_t * jnp.tanh(c_new)
        h_b = h_new.astype(wdt)

        # --- vocab-tiled head + streaming exact top-k + logsumexp,
        # two interleaved streams (see n_streams note above) ---
        def head_tile(s, j):
            hb_s = h_b[s * rows2:(s + 1) * rows2]
            return (jnp.dot(hb_s, cw_ref[:, j * v_tile:(j + 1) * v_tile],
                            preferred_element_type=jnp.float32)
                    + cb_ref[0, j * v_tile:(j + 1) * v_tile])

        run_m = [jnp.full((rows2, 1), NEG, jnp.float32)] * n_streams
        run_se = [jnp.zeros((rows2, 1), jnp.float32)] * n_streams
        run_v = [jnp.full((rows2, k), NEG, jnp.float32)] * n_streams
        run_i = [jnp.zeros((rows2, k), jnp.int32)] * n_streams
        logits_next = [head_tile(s, 0) for s in range(n_streams)]
        for j in range(n_vt):
            for s in range(n_streams):
                logits = logits_next[s]
                # issue the NEXT head matmul (MXU) before this tile's
                # top-k (VPU): with 2 streams the other stream's top-k
                # overlaps it
                if j + 1 < n_vt:
                    logits_next[s] = head_tile(s, j + 1)
                if profile == "no_topk":
                    run_v[s] = run_v[s] + jnp.sum(logits, axis=1,
                                                  keepdims=True) * 1e-30
                    continue
                tile_max = jnp.max(logits, axis=1, keepdims=True)
                m_new = jnp.maximum(run_m[s], tile_max)
                run_se[s] = run_se[s] * jnp.exp(run_m[s] - m_new) + jnp.sum(
                    jnp.exp(logits - m_new), axis=1, keepdims=True)
                run_m[s] = m_new
                tv, ti = topk_fn(logits, j * v_tile, k, tile_max=tile_max)
                run_v[s], run_i[s] = _merge_topk(run_v[s], run_i[s], tv, ti,
                                                 k)
        logp_top, idx_top = [], []
        for s in range(n_streams):
            if profile == "no_topk":
                logp_top.append(run_v[s])
                # add a materialized zero so the iota isn't laid out as a
                # sublane-broadcast (slicing those crashes ApplyVectorLayout)
                idx_top.append(
                    jax.lax.broadcasted_iota(jnp.int32, (rows2, k), 1) + 3
                    + (run_v[s] * 1e-30).astype(jnp.int32))
            else:
                logp_top.append(run_v[s] - (run_m[s] + jnp.log(run_se[s])))
                idx_top.append(run_i[s])

        # --- beam select + next-input embedding, interleaved per stream:
        # stream s's one-hot embedding matmul (MXU) is issued before stream
        # s+1's select (VPU)
        rank = jax.lax.broadcasted_iota(jnp.int32, (n2, k), 1)
        for s in range(n_streams):
            r0 = s * rows2
            h_new_s = h_new[r0:r0 + rows2]
            c_new_s = c_new[r0:r0 + rows2]
            if profile == "no_select":
                words = ((rank + t
                          + jnp.sum(logp_top[s] * 1e-30).astype(jnp.int32)
                          + jnp.sum(idx_top[s]) % 2) % (vocab - 4) + 3)
                h_scr[r0:r0 + rows2] = h_new_s.astype(wdt).astype(jnp.float32)
                c_scr[r0:r0 + rows2] = c_new_s.astype(wdt).astype(jnp.float32)
            else:
                words = _beam_select(
                    t, is_first, logp_top[s], idx_top[s], h_new_s, c_new_s,
                    tok_ref, len_ref, score_ref,
                    h_scr, c_scr, seqs_scr, scores_scr, alive_scr,
                    k=k, n_img=n2, h_dim=h_dim, max_len=max_len,
                    end_token=end_token, wdt=wdt, rank=rank,
                    row0=r0, img0=s * n2)

            if profile == "no_embed":
                x_scr[r0:r0 + rows2] = (
                    x_scr[r0:r0 + rows2] * 1.0
                    + jnp.sum(words.astype(jnp.float32)) * 1e-30)
            else:
                # next input: x = onehot(words) @ Emb, vocab-tiled.  Exact:
                # a single bf16 1.0 times the embedding row, f32-accumulated,
                # reproduces the gathered row bit-for-bit.
                # sublane-concat needs canonical (offset-0) lane layouts; a
                # lane reduction re-lays each column out (Mosaic rejects raw
                # lane slices)
                flat_w = jnp.concatenate(
                    [jnp.sum(jnp.where(rank == q, words, 0), axis=1,
                             keepdims=True)
                     for q in range(k)], axis=0)               # (rows2, 1)
                x_new = jnp.zeros((rows2, e_dim), jnp.float32)
                for j in range(n_vt):
                    col_v = j * v_tile + jax.lax.broadcasted_iota(
                        jnp.int32, (rows2, v_tile), 1)
                    onehot = (col_v == flat_w).astype(wdt)
                    x_new = x_new + jnp.dot(
                        onehot, emb_ref[j * v_tile:(j + 1) * v_tile, :],
                        preferred_element_type=jnp.float32)
                x_scr[r0:r0 + rows2] = x_new

        if profile != "no_select":
            done_scr[0, 0] = (jnp.sum(alive_scr[:]) == 0).astype(jnp.int32)


def _beam_select(t, is_first, logp_top, idx_top, h_new, c_new,
                 tok_ref, len_ref, score_ref,
                 h_scr, c_scr, seqs_scr, scores_scr, alive_scr,
                 *, k, n_img, h_dim, max_len, end_token, wdt, rank,
                 row0=0, img0=0):
    """Per-image beam selection, state gather and best-completed tracking.

    Rows are beam-major (slot ``p`` of image ``i`` at row ``p*n_img + i``);
    all cross-slot work is static slices + masked sums.  Returns the
    selected next words ``(n_img, k)``.
    """
    i1 = img0 + n_img  # image range of this stream within the block
    # --- per-image candidate merge
    # candidate index p*k+q matches the XLA path's (k, k) flatten order.
    parts_s, parts_w = [], []
    for p in range(k):
        lp = logp_top[p * n_img:(p + 1) * n_img, :]       # (n_img, k)
        iw = idx_top[p * n_img:(p + 1) * n_img, :]
        sc = scores_scr[img0:i1, p:p + 1]                  # (n_img, 1)
        # int32 select: Mosaic cannot legalize select over i1 vectors
        row_ok = jnp.where(is_first,
                           jnp.full((n_img, 1), int(p == 0), jnp.int32),
                           alive_scr[img0:i1, p:p + 1])
        parts_s.append(jnp.where(row_ok > 0, sc + lp, NEG))
        parts_w.append(iw)
    totals = jnp.concatenate(parts_s, axis=1)              # (n_img, k*k)
    cand_w = jnp.concatenate(parts_w, axis=1)              # (n_img, k*k)
    cand_iota = jax.lax.broadcasted_iota(jnp.int32, (n_img, k * k), 1)

    # exact top-k over k*k candidates; ties -> lowest candidate index
    # (matches lax.top_k over the flattened (k, width) array)
    tops, picks, words = [], [], []
    cur = totals
    for _ in range(k):
        m = jnp.max(cur, axis=1, keepdims=True)
        pick = jnp.min(jnp.where(cur == m, cand_iota, BIG), axis=1,
                       keepdims=True)
        word = jnp.sum(jnp.where(cand_iota == pick, cand_w, 0), axis=1,
                       keepdims=True)
        tops.append(m)
        picks.append(pick)
        words.append(word)
        cur = jnp.where(cand_iota == pick, NEG, cur)
    top_scores = jnp.concatenate(tops, axis=1)             # (n_img, k)
    prev = jnp.concatenate(picks, axis=1) // k             # (n_img, k)
    words = jnp.concatenate(words, axis=1)                 # (n_img, k)

    n_take = jnp.where(is_first, k,
                       jnp.sum(alive_scr[img0:i1], axis=1, keepdims=True))
    valid = rank < n_take
    completed = valid & (words == end_token)
    still = valid & (words != end_token)

    # --- state gather by parent slot: masked sums over k static slices
    col_l = jax.lax.broadcasted_iota(jnp.int32, (n_img, max_len), 1)
    new_seqs, new_h, new_c = [], [], []
    for q in range(k):
        sq = jnp.zeros((n_img, max_len), jnp.int32)
        hq = jnp.zeros((n_img, h_dim), jnp.float32)
        cq = jnp.zeros((n_img, h_dim), jnp.float32)
        for p in range(k):
            sel_i = (prev[:, q:q + 1] == p).astype(jnp.int32)
            sel_f = sel_i.astype(jnp.float32)
            sq = sq + sel_i * seqs_scr[row0 + p * n_img:
                                       row0 + (p + 1) * n_img, :]
            hq = hq + sel_f * h_new[p * n_img:(p + 1) * n_img, :]
            cq = cq + sel_f * c_new[p * n_img:(p + 1) * n_img, :]
        sq = jnp.where(col_l == t + 1, words[:, q:q + 1], sq)
        new_seqs.append(sq)
        new_h.append(hq)
        new_c.append(cq)

    # --- best-completed tracking (strict >, list-order tie-break) ---
    comp = jnp.where(completed, top_scores, NEG)
    best_val = jnp.max(comp, axis=1, keepdims=True)        # (n_img, 1)
    i_best = jnp.min(jnp.where(comp == best_val, rank, BIG), axis=1,
                     keepdims=True)
    improves = best_val > score_ref[img0:i1]
    best_row = jnp.zeros((n_img, max_len), jnp.int32)
    for q in range(k):
        best_row = best_row + (i_best == q).astype(jnp.int32) * new_seqs[q]
    tok_ref[img0:i1] = jnp.where(improves, best_row, tok_ref[img0:i1])
    len_ref[img0:i1] = jnp.where(improves, t + 2, len_ref[img0:i1])
    score_ref[img0:i1] = jnp.where(improves, best_val, score_ref[img0:i1])

    # --- write back state ---
    # round h/c through the weight dtype: the XLA step path stores beam
    # state in the caller's (bf16) dtype between steps, so the mega
    # kernel must apply the same rounding for token-exact parity
    r1 = row0 + n_img * k
    seqs_scr[row0:r1] = jnp.concatenate(new_seqs, axis=0)
    h_scr[row0:r1] = jnp.concatenate(new_h, axis=0).astype(wdt).astype(
        jnp.float32)
    c_scr[row0:r1] = jnp.concatenate(new_c, axis=0).astype(wdt).astype(
        jnp.float32)
    scores_scr[img0:i1] = jnp.where(still, top_scores, NEG)
    alive_scr[img0:i1] = still.astype(jnp.int32)
    return words


@functools.partial(
    jax.jit,
    static_argnames=("batch", "start_token", "end_token", "k",
                     "max_seq_length", "n_img_block", "v_tile",
                     "feed_feature", "n_streams", "cell", "interpret",
                     "_profile", "topk_fold"))
def mega_beam_decode(
    params: dict,
    features: Optional[jax.Array],    # (B, k, E) or None (research mode)
    style: jax.Array,
    batch: int,
    start_token: int = 1,
    end_token: int = 2,
    k: int = 5,
    max_seq_length: int = 40,
    n_img_block: int = 64,
    v_tile: int = 2048,
    feed_feature: bool = True,
    n_streams: int = 1,
    cell: str = "factored",
    interpret: bool = False,
    _profile: str = "full",
    topk_fold: bool = False,
) -> BeamResult:
    """Whole-beam-search-in-one-kernel decode for ``batch`` images.

    Returns :class:`BeamResult` with leading batch dim, token-identical to
    ``beam_search_batched`` over ``factored_lstm.decode_step``.
    """
    if cell == "factored":
        emb = params["B"]
        h_dim = params["W_w"].shape[0]
        f_dim = params["U_w"].shape[1]
        cw = params["C_w"]
        cb = params["C_b"]
    else:  # NIC torch-LSTM decoder (models/lstm.py param layout)
        emb = params["embed"]
        h_dim = params["cell"]["W_hh"].shape[0]
        f_dim = h_dim
        cw = params["linear_w"]
        cb = params["linear_b"]
    vocab, e_dim = emb.shape
    wdt = cw.dtype
    max_len = max_seq_length + 2

    n_img_block = min(n_img_block, batch)
    if n_img_block % n_streams:
        n_streams = 1
    bp = -(-batch // n_img_block) * n_img_block
    n_blocks = bp // n_img_block
    rows_blk = n_img_block * k
    n2 = n_img_block // n_streams

    # pad vocab to a v_tile multiple: C_b pads with -1e30 (never selected,
    # exp()->0 in the normalizer), C_w/Emb pad with zeros.
    v_tile = min(v_tile, -(-vocab // 128) * 128)
    vp = -(-vocab // v_tile) * v_tile
    cb = cb.reshape(1, -1).astype(jnp.float32)
    if vp != vocab:
        cw = jnp.pad(cw, ((0, 0), (0, vp - vocab)))
        cb = jnp.pad(cb, ((0, 0), (0, vp - vocab)),
                     constant_values=float(NEG))
        emb = jnp.pad(emb, ((0, vp - vocab), (0, 0)))

    if features is None:
        feats = jnp.zeros((bp, k, e_dim), wdt)
    else:
        feats = features.astype(wdt)
        if bp != batch:
            feats = jnp.pad(feats, ((0, bp - batch), (0, 0), (0, 0)))
    # block-stream-beam-major rows: block i holds, per stream, rows
    # [slot p][local image i_l]
    feats = (feats.reshape(n_blocks, n_streams, n2, k, e_dim)
             .transpose(0, 1, 3, 2, 4).reshape(bp * k, e_dim))

    if cell == "factored":
        cell_ws = [params["V_w"], params["V_b"],
                   jnp.take(params["S_w"], style, axis=0),
                   jnp.take(params["S_b"], style, axis=0),
                   params["U_w"], params["U_b"],
                   params["W_w"], params["W_b"]]
        cell_shapes = [(e_dim, 4 * f_dim), (4, f_dim),
                       (4, f_dim, f_dim), (4, f_dim),
                       (4, f_dim, h_dim), (4, h_dim),
                       (h_dim, 4 * h_dim), (4, h_dim)]
    else:
        dummy = jnp.zeros((1, 1), wdt)
        lc = params["cell"]
        cell_ws = [lc["W_ih"], lc["b_ih"].reshape(1, -1),
                   dummy, dummy,
                   dummy, dummy,
                   lc["W_hh"], lc["b_hh"].reshape(1, -1)]
        cell_shapes = [(e_dim, 4 * h_dim), (1, 4 * h_dim),
                       (1, 1), (1, 1), (1, 1), (1, 1),
                       (h_dim, 4 * h_dim), (1, 4 * h_dim)]

    kernel = functools.partial(
        _kernel, k=k, n_img=n_img_block, f_dim=f_dim, h_dim=h_dim,
        e_dim=e_dim, v_tile=v_tile, vocab=vp, max_len=max_len,
        start_token=start_token, end_token=end_token,
        feed_feature=feed_feature, n_streams=n_streams, cell=cell,
        profile=_profile, topk_fold=topk_fold)

    vmem = pltpu.VMEM
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, t: tuple([0] * len(shape)), memory_space=vmem)
    row_spec = pl.BlockSpec((rows_blk, e_dim), lambda i, t: (i, 0),
                            memory_space=vmem)
    img = lambda w: pl.BlockSpec((n_img_block, w), lambda i, t: (i, 0),  # noqa: E731
                                 memory_space=vmem)

    out_shape = (
        jax.ShapeDtypeStruct((bp, max_len), jnp.int32),
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
        grid=(n_blocks, max_seq_length + 1),
        in_specs=([row_spec, full(vp, e_dim)]
                  + [full(*sh) for sh in cell_shapes]
                  + [full(h_dim, vp), full(1, vp)]),
        out_specs=(img(max_len), img(1), img(1)),
        scratch_shapes=[
            pltpu.VMEM((rows_blk, h_dim), jnp.float32),    # h
            pltpu.VMEM((rows_blk, h_dim), jnp.float32),    # c
            pltpu.VMEM((rows_blk, e_dim), jnp.float32),    # x
            pltpu.VMEM((rows_blk, max_len), jnp.int32),    # seqs
            pltpu.VMEM((n_img_block, k), jnp.float32),     # beam scores
            pltpu.VMEM((n_img_block, k), jnp.int32),       # alive
            pltpu.SMEM((1, 1), jnp.int32),                 # done flag
        ],
        out_shape=out_shape,
        compiler_params=compiler_params,
        interpret=interpret,
    )
    tokens, lengths, scores = call(feats, emb, *cell_ws, cw, cb)
    return BeamResult(tokens=tokens[:batch],
                      length=lengths[:batch, 0],
                      score=scores[:batch, 0])
