"""Pallas TPU kernel: fused attention decode step for the *_att decoders.

Round 1 decoded the attention families (StyleNet FactoredLSTM+Att and
NIC+Att — the reference's best models, ``stylenet/model_att.py:307-426``,
``nic/model_att.py:163-306``) on the per-step XLA path.  This kernel fuses
one whole decode step:

    re-attend (dec projection + relu + score + softmax) -> context reduce
    -> f_beta gate -> [emb ; gated context] -> recurrent cell
    -> vocab-tiled output head -> streaming exact top-k + logsumexp

with the per-image spatial features and hoisted encoder projection
(``att1 = feats @ enc_w + enc_b``) kept as per-block VMEM operands, and the
(rows, V) logits never leaving VMEM (same streaming top-k as
``ops/pallas_decode.py``).

Rows are beam-major per block (slot ``p`` of image ``j`` at row
``p*n_img + j``) so every per-image op is a static sublane slice; the
attention score and context reductions are MATCHED-BATCH ``dot_general``s,
which Mosaic lowers (probed on hardware).  The wrapper permutes the
image-major rows of ``beam_search_batched`` in and out.

Supports both cells: ``kind="factored"`` (stacked-style FactoredLSTM,
``h = o*c`` quirk) and ``kind="lstm"`` (torch-order LSTMCell,
``h = o*tanh(c)``).  Interpret-mode parity vs the XLA
``factored_att_decode_step`` / ``rnn_att_decode_step`` oracles is tested in
``tests/test_pallas_att.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icee_tpu.ops.pallas_decode import (NEG, _merge_topk, _row_topk,
                                        _row_topk_fold)

N_COMMON = 11  # x, h, c, feat, att1, dec_w, dec_b, full_w, full_b, fb_w, fb_b


def _attend_block(x_ref, h_ref, feat_ref, att1_ref, decw_ref, decb_ref,
                  fullw_ref, fullb_ref, fbw_ref, fbb_ref,
                  *, k, n_img, wdt, row0=0, img0=0):
    """Per-slot re-attention + gated context -> (x_full, alpha_full).

    ``row0``/``img0`` select a stream window (rows [row0, row0+n_img*k),
    images [img0, img0+n_img)) so the mega kernel can interleave
    independent image streams; the per-step kernel uses the defaults.

    VMEM note (probed on hardware): the unrolled k-slot loop's relu
    temporaries ((n_img, P, A) each) live in vector registers and SPILL to
    scoped VMEM (measured 56 MB of spill slots at 32-image blocks — the
    binding constraint on block size).  Staging them through a VMEM scratch
    does NOT shrink the spill (store-forwarding keeps the registers live);
    the fix is tiling the attention dim A so each slot's peak live
    temporary is (n_img, P, a_tile).
    """
    rows = n_img * k
    a_dim = att1_ref.shape[-1]
    a_tile = 128 if a_dim % 128 == 0 else a_dim
    h32 = h_ref[row0:row0 + rows].astype(jnp.float32)
    att2 = jnp.dot(h32.astype(wdt), decw_ref[:],
                   preferred_element_type=jnp.float32) + decb_ref[0, :]
    att1_v = att1_ref[img0:img0 + n_img]      # (n_img, P, A)
    feat_v = feat_ref[img0:img0 + n_img]      # (n_img, P, FS)
    fullw_b = jnp.broadcast_to(fullw_ref[:][None],
                               (n_img,) + fullw_ref.shape)  # (n_img, A, 1)
    xs, alphas = [], []
    for p in range(k):
        sl = slice(p * n_img, (p + 1) * n_img)
        a2p = att2[sl].astype(att1_v.dtype)                 # (n_img, A)
        # A-tiled relu+score: e = sum_t relu(att1+att2)[.., t] @ full_w[t]
        # (f32 accumulation; relu is elementwise so tiling is exact, only
        # the contraction order differs from a single full-A dot)
        e = jnp.zeros((n_img, feat_v.shape[1], 1), jnp.float32)
        for a0 in range(0, a_dim, a_tile):
            # slice BEFORE adding the axis: `a2p[:, None, a0:a1]` is
            # advanced indexing -> lax.gather, which Mosaic cannot lower
            a2p_t = a2p[:, a0:a0 + a_tile]
            r3_t = jnp.maximum(
                att1_v[:, :, a0:a0 + a_tile] + a2p_t[:, None, :], 0.0)
            e = e + jax.lax.dot_general(
                r3_t.astype(wdt), fullw_b[:, a0:a0 + a_tile, :],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # (n_img, P, 1)
        e2 = e[:, :, 0] + fullb_ref[0, 0]                   # (n_img, P)
        alpha = jax.nn.softmax(e2, axis=1)
        ctx = jax.lax.dot_general(
            alpha[:, None, :].astype(wdt), feat_v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]    # (n_img, FS)
        gate = jax.nn.sigmoid(
            jnp.dot(h32[sl].astype(wdt), fbw_ref[:],
                    preferred_element_type=jnp.float32) + fbb_ref[0, :])
        gctx = gate * ctx
        x_p = jnp.concatenate(
            [x_ref[row0 + p * n_img:row0 + (p + 1) * n_img].astype(
                jnp.float32), gctx], axis=1)                # (n_img, E+FS)
        xs.append(x_p)
        alphas.append(alpha)
    return jnp.concatenate(xs, axis=0), jnp.concatenate(alphas, axis=0)


def _head_topk(h_b, cw_ref, cb_ref, *, ktop, v_tile, vocab):
    rows = h_b.shape[0]
    n_vt = vocab // v_tile
    run_m = jnp.full((rows, 1), NEG, jnp.float32)
    run_se = jnp.zeros((rows, 1), jnp.float32)
    run_v = jnp.full((rows, ktop), NEG, jnp.float32)
    run_i = jnp.zeros((rows, ktop), jnp.int32)
    for j in range(n_vt):
        logits = jnp.dot(h_b, cw_ref[:, j * v_tile:(j + 1) * v_tile],
                         preferred_element_type=jnp.float32)
        logits = logits + cb_ref[0, j * v_tile:(j + 1) * v_tile]
        tile_max = jnp.max(logits, axis=1, keepdims=True)
        m_new = jnp.maximum(run_m, tile_max)
        run_se = run_se * jnp.exp(run_m - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=1, keepdims=True)
        run_m = m_new
        tv, ti = _row_topk(logits, j * v_tile, ktop, tile_max=tile_max)
        run_v, run_i = _merge_topk(run_v, run_i, tv, ti, ktop)
    return run_v - (run_m + jnp.log(run_se)), run_i


def _factored_cell_block(x, c_prev, h_prev_b, refs, *, f_dim, h_dim, wdt):
    vw, vb, sw, sb, uw, ub, ww, wb = refs
    v_all = jnp.dot(x.astype(wdt), vw[:], preferred_element_type=jnp.float32)
    w_all = jnp.dot(h_prev_b, ww[:], preferred_element_type=jnp.float32)
    z = []
    for g in range(4):
        v_g = v_all[:, g * f_dim:(g + 1) * f_dim] + vb[g, :]
        s_g = jnp.dot(v_g.astype(wdt), sw[g],
                      preferred_element_type=jnp.float32) + sb[g, :]
        u_g = jnp.dot(s_g.astype(wdt), uw[g],
                      preferred_element_type=jnp.float32) + ub[g, :]
        z.append(u_g + w_all[:, g * h_dim:(g + 1) * h_dim] + wb[g, :])
    i_t = jax.nn.sigmoid(z[0])
    f_t = jax.nn.sigmoid(z[1])
    o_t = jax.nn.sigmoid(z[2])
    g_t = jnp.tanh(z[3])
    c_new = f_t * c_prev + i_t * g_t
    return o_t * c_new, c_new          # h = o*c quirk (model.py:153)


def _lstm_cell_block(x, c_prev, h_prev_b, refs, *, h_dim, wdt):
    wih, whh, bih, bhh = refs
    z = (jnp.dot(x.astype(wdt), wih[:], preferred_element_type=jnp.float32)
         + bih[0, :]
         + jnp.dot(h_prev_b, whh[:], preferred_element_type=jnp.float32)
         + bhh[0, :])
    i_t = jax.nn.sigmoid(z[:, 0 * h_dim:1 * h_dim])
    f_t = jax.nn.sigmoid(z[:, 1 * h_dim:2 * h_dim])
    g_t = jnp.tanh(z[:, 2 * h_dim:3 * h_dim])
    o_t = jax.nn.sigmoid(z[:, 3 * h_dim:4 * h_dim])
    c_new = f_t * c_prev + i_t * g_t
    return o_t * jnp.tanh(c_new), c_new


def _kernel(*refs, kind, k, n_img, f_dim, h_dim, ktop, v_tile, vocab):
    n_cell = 8 if kind == "factored" else 4
    (x_ref, h_ref, c_ref, feat_ref, att1_ref, decw_ref, decb_ref,
     fullw_ref, fullb_ref, fbw_ref, fbb_ref) = refs[:N_COMMON]
    cell_refs = refs[N_COMMON:N_COMMON + n_cell]
    cw_ref, cb_ref = refs[N_COMMON + n_cell:N_COMMON + n_cell + 2]
    (logp_ref, idx_ref, h_out_ref, c_out_ref,
     alpha_ref) = refs[N_COMMON + n_cell + 2:]
    wdt = cw_ref.dtype

    x_full, alpha_full = _attend_block(
        x_ref, h_ref, feat_ref, att1_ref, decw_ref, decb_ref,
        fullw_ref, fullb_ref, fbw_ref, fbb_ref, k=k, n_img=n_img, wdt=wdt)
    alpha_ref[:] = alpha_full.astype(alpha_ref.dtype)

    c_prev = c_ref[:].astype(jnp.float32)
    h_prev_b = h_ref[:].astype(wdt)
    if kind == "factored":
        h_new, c_new = _factored_cell_block(
            x_full, c_prev, h_prev_b, cell_refs, f_dim=f_dim, h_dim=h_dim,
            wdt=wdt)
    else:
        h_new, c_new = _lstm_cell_block(
            x_full, c_prev, h_prev_b, cell_refs, h_dim=h_dim, wdt=wdt)
    h_out_ref[:] = h_new.astype(h_out_ref.dtype)
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)

    logp, idx = _head_topk(h_new.astype(wdt), cw_ref, cb_ref,
                           ktop=ktop, v_tile=v_tile, vocab=vocab)
    logp_ref[:] = logp
    idx_ref[:] = idx


@functools.partial(
    jax.jit,
    static_argnames=("kind", "k", "ktop", "n_img_block", "v_tile",
                     "interpret"))
def fused_att_decode_step_topk(
    cell_params: dict,       # factored: V/S(sliced)/U/W + C_w/C_b
    att_params: dict,        # dec_w/dec_b/full_w/full_b (style-selected)
    gate_params: dict,       # f_beta_w/f_beta_b
    x_emb: jax.Array,        # (rows, E) prev-word embeddings, IMAGE-major
    h: jax.Array,            # (rows, H)
    c: jax.Array,            # (rows, H)
    features: jax.Array,     # (n_img, P, FS) per-image spatial features
    att1: jax.Array,         # (n_img, P, A) hoisted encoder projection
    kind: str = "factored",
    k: int = 5,
    ktop: int = 5,
    n_img_block: int = 32,
    v_tile: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """-> (logp_top (rows, ktop), idx_top, h', c', alpha (rows, P)).

    Rows are image-major (image i's beam slots contiguous) as produced by
    ``beam_search_batched``; the wrapper permutes to the kernel's beam-major
    block layout and back.
    """
    rows, e_dim = x_emb.shape
    n_img = rows // k
    h_dim = h.shape[-1]
    n_pix, fs = features.shape[1], features.shape[2]
    a_dim = att1.shape[2]
    wdt = cell_params["C_w"].dtype
    vocab = cell_params["C_w"].shape[-1]
    f_dim = cell_params["U_w"].shape[1] if kind == "factored" else h_dim

    n_img_block = min(n_img_block, n_img)
    if n_img % n_img_block:
        n_img_block = n_img  # small calls: one block
    n_blocks = n_img // n_img_block
    rows_blk = n_img_block * k

    # pad vocab to a v_tile multiple (bias -inf on padded cols)
    v_tile = min(v_tile, -(-vocab // 128) * 128)
    vp = -(-vocab // v_tile) * v_tile
    cw, cb = cell_params["C_w"], cell_params["C_b"]
    cb = cb.reshape(1, -1).astype(jnp.float32)
    if vp != vocab:
        cw = jnp.pad(cw, ((0, 0), (0, vp - vocab)))
        cb = jnp.pad(cb, ((0, 0), (0, vp - vocab)), constant_values=float(NEG))

    # image-major -> block-beam-major row permutation (static)
    import numpy as np

    perm = np.empty((rows,), np.int32)
    r = 0
    for ib in range(n_blocks):
        for p in range(k):
            for j in range(n_img_block):
                perm[r] = (ib * n_img_block + j) * k + p
                r += 1
    inv = np.argsort(perm).astype(np.int32)
    take = lambda a: jnp.take(a, perm, axis=0)   # noqa: E731
    back = lambda a: jnp.take(a, inv, axis=0)    # noqa: E731

    vmem = pltpu.VMEM
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple([0] * len(shape)), memory_space=vmem)
    row = lambda w: pl.BlockSpec((rows_blk, w), lambda i: (i, 0),  # noqa: E731
                                 memory_space=vmem)
    img3 = lambda p_, w: pl.BlockSpec(  # noqa: E731
        (n_img_block, p_, w), lambda i: (i, 0, 0), memory_space=vmem)

    in_specs = [
        row(e_dim), row(h_dim), row(h_dim),
        img3(n_pix, fs), img3(n_pix, a_dim),
        full(h_dim, a_dim), full(1, a_dim),          # dec_w, dec_b
        full(a_dim, 1), full(1, 1),                  # full_w, full_b
        full(h_dim, fs), full(1, fs),                # f_beta
    ]
    if kind == "factored":
        cell_in = [cell_params["V_w"], cell_params["V_b"],
                   cell_params["S_w"], cell_params["S_b"],
                   cell_params["U_w"], cell_params["U_b"],
                   cell_params["W_w"], cell_params["W_b"]]
        in_specs += [
            full(e_dim + fs, 4 * f_dim), full(4, f_dim),
            full(4, f_dim, f_dim), full(4, f_dim),
            full(4, f_dim, h_dim), full(4, h_dim),
            full(h_dim, 4 * h_dim), full(4, h_dim),
        ]
    else:
        cell_in = [cell_params["W_ih"], cell_params["W_hh"],
                   cell_params["b_ih"].reshape(1, -1),
                   cell_params["b_hh"].reshape(1, -1)]
        in_specs += [
            full(e_dim + fs, 4 * h_dim), full(h_dim, 4 * h_dim),
            full(1, 4 * h_dim), full(1, 4 * h_dim),
        ]
    in_specs += [full(h_dim, vp), full(1, vp)]       # head

    out_specs = (row(ktop), row(ktop), row(h_dim), row(h_dim), row(n_pix))
    out_shape = (
        jax.ShapeDtypeStruct((rows, ktop), jnp.float32),
        jax.ShapeDtypeStruct((rows, ktop), jnp.int32),
        jax.ShapeDtypeStruct((rows, h_dim), h.dtype),
        jax.ShapeDtypeStruct((rows, h_dim), c.dtype),
        jax.ShapeDtypeStruct((rows, n_pix), jnp.float32),
    )
    kernel = functools.partial(
        _kernel, kind=kind, k=k, n_img=n_img_block, f_dim=f_dim,
        h_dim=h_dim, ktop=ktop, v_tile=v_tile, vocab=vp)
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    outs = call(take(x_emb), take(h), take(c),
                features.astype(wdt), att1.astype(wdt),
                att_params["dec_w"], att_params["dec_b"].reshape(1, -1),
                att_params["full_w"].reshape(-1, 1),
                # f32: Mosaic only supports 32-bit scalar vector.extracts
                att_params["full_b"].reshape(1, 1).astype(jnp.float32),
                gate_params["f_beta_w"], gate_params["f_beta_b"].reshape(1, -1),
                *cell_in, cw, cb)
    logp, idx, h2, c2, alpha = outs
    return back(logp), back(idx), back(h2), back(c2), back(alpha)


# ---------------------------------------------------------------------------
# Attention MEGA kernel: the whole attention beam search in ONE pallas_call
# ---------------------------------------------------------------------------

def _head_select_embed_phase(
        h_news, c_news, t, is_first,
        cw_ref, cb_ref, emb_ref, tok_ref, len_ref, score_ref,
        h_scr, c_scr, embx_scr, seqs_scr, scores_scr, alive_scr, done_scr,
        *, k, n2, rows2, n_streams, n_vt, v_tile, e_dim, h_dim, max_len,
        end_token, wdt, topk_fn, profile):
    """Per-step tail shared by both attention mega kernels: vocab-tiled head
    + streaming exact top-k + logsumexp, beam select/state gather, and the
    one-hot next-token embedding — phases interleaved across ``n_streams``
    independent image halves so one stream's top-k/select (VPU) overlaps the
    other's head/embedding matmuls (MXU)."""
    from icee_tpu.ops.pallas_beam import _beam_select

    def head_tile(s, j):
        return (jnp.dot(h_news[s].astype(wdt),
                        cw_ref[:, j * v_tile:(j + 1) * v_tile],
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
            # issue the NEXT head matmul (MXU) before this tile's top-k
            # (VPU): with 2 streams the other stream's top-k overlaps it
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
            run_v[s], run_i[s] = _merge_topk(run_v[s], run_i[s], tv, ti, k)

    # --- beam select + next-input embedding, interleaved per stream ---
    rank = jax.lax.broadcasted_iota(jnp.int32, (n2, k), 1)
    for s in range(n_streams):
        r0 = s * rows2
        if profile == "no_topk":
            logp_top = run_v[s]
            run_i[s] = (jax.lax.broadcasted_iota(
                jnp.int32, (rows2, k), 1) + 3
                + (run_v[s] * 1e-30).astype(jnp.int32))
        else:
            logp_top = run_v[s] - (run_m[s] + jnp.log(run_se[s]))
        words = _beam_select(
            t, is_first, logp_top, run_i[s], h_news[s], c_news[s],
            tok_ref, len_ref, score_ref,
            h_scr, c_scr, seqs_scr, scores_scr, alive_scr,
            k=k, n_img=n2, h_dim=h_dim, max_len=max_len,
            end_token=end_token, wdt=wdt, rank=rank,
            row0=r0, img0=s * n2)

        if profile == "no_embed":
            embx_scr[r0:r0 + rows2] = (
                embx_scr[r0:r0 + rows2] * 1.0
                + jnp.sum(words.astype(jnp.float32)) * 1e-30)
            continue
        # next word embedding: one-hot matmul over vocab tiles (exact)
        flat_w = jnp.concatenate(
            [jnp.sum(jnp.where(rank == q, words, 0), axis=1,
                     keepdims=True)
             for q in range(k)], axis=0)                # (rows2, 1)
        x_new = jnp.zeros((rows2, e_dim), jnp.float32)
        for j in range(n_vt):
            col_v = j * v_tile + jax.lax.broadcasted_iota(
                jnp.int32, (rows2, v_tile), 1)
            onehot = (col_v == flat_w).astype(wdt)
            x_new = x_new + jnp.dot(
                onehot, emb_ref[j * v_tile:(j + 1) * v_tile, :],
                preferred_element_type=jnp.float32)
        embx_scr[r0:r0 + rows2] = x_new

    done_scr[0, 0] = (jnp.sum(alive_scr[:]) == 0).astype(jnp.int32)

def _mega_att_kernel(feat_ref, att1_ref, emb_ref,
                     decw_ref, decb_ref, fullw_ref, fullb_ref,
                     fbw_ref, fbb_ref, ihw_ref, ihb_ref, icw_ref, icb_ref,
                     vw_ref, vb_ref, sw_ref, sb_ref, uw_ref, ub_ref,
                     ww_ref, wb_ref, cw_ref, cb_ref,
                     tok_ref, len_ref, score_ref,
                     h_scr, c_scr, embx_scr, seqs_scr, scores_scr,
                     alive_scr, done_scr,
                     *, kind: str, k: int, n_img: int, f_dim: int,
                     h_dim: int, e_dim: int, v_tile: int, vocab: int,
                     max_len: int, start_token: int, end_token: int,
                     n_streams: int = 1, topk_fold: bool = False,
                     profile: str = "full"):
    """Grid ``(n_blocks, T+1)``: per-image spatial features and the hoisted
    encoder projection stay VMEM-resident across ALL steps (the per-step
    fused kernel re-reads ~1 MB/image from HBM every step — the dominant
    cost it leaves on the table).  Rows beam-major; state/select logic is
    ``pallas_beam._beam_select`` verbatim.

    ``n_streams=2`` splits the block into independent image halves (stream
    ``s`` owns images ``[s*n2, (s+1)*n2)`` and rows ``[s*rows2, ...)``,
    beam-major within) and interleaves their phases so one stream's
    streaming top-k / beam select (VPU) overlaps the other's attention /
    cell / head / embedding matmuls (MXU) — the same interleave that bought
    1.58x on the non-attention mega kernel (``ops/pallas_beam.py``).
    """
    from icee_tpu.ops.pallas_beam import _beam_select

    t = pl.program_id(1)
    rows = n_img * k
    n2 = n_img // n_streams
    rows2 = n2 * k
    n_vt = vocab // v_tile
    wdt = cw_ref.dtype
    use_fold = topk_fold and v_tile > 128 and (v_tile & (v_tile - 1)) == 0
    topk_fn = _row_topk_fold if use_fold else _row_topk

    @pl.when(t == 0)
    def _init():
        col_l = jax.lax.broadcasted_iota(jnp.int32, (rows, max_len), 1)
        seqs_scr[:] = jnp.where(col_l == 0, start_token, end_token)
        # h/c from the mean spatial feature (model_att.py:185-194); rounded
        # through the weight dtype like the XLA beam state
        mean = jnp.mean(feat_ref[:].astype(jnp.float32), axis=1).astype(wdt)
        h0 = (jnp.dot(mean, ihw_ref[:], preferred_element_type=jnp.float32)
              + ihb_ref[0, :]).astype(wdt).astype(jnp.float32)
        c0 = (jnp.dot(mean, icw_ref[:], preferred_element_type=jnp.float32)
              + icb_ref[0, :]).astype(wdt).astype(jnp.float32)
        # stream-major rows: stream s's slot p of local image j at row
        # s*rows2 + p*n2 + j
        h_scr[:] = jnp.concatenate(
            [h0[s * n2:(s + 1) * n2] for s in range(n_streams)
             for _ in range(k)], axis=0)
        c_scr[:] = jnp.concatenate(
            [c0[s * n2:(s + 1) * n2] for s in range(n_streams)
             for _ in range(k)], axis=0)
        # research-style step 1: embed <start> (no feature input)
        embx_scr[:] = jnp.broadcast_to(
            emb_ref[start_token, :].astype(jnp.float32), (rows, e_dim))
        scores_scr[:] = jnp.zeros_like(scores_scr)
        alive_scr[:] = jnp.ones_like(alive_scr)
        tok_ref[:] = jnp.full_like(tok_ref, end_token)
        len_ref[:] = jnp.ones_like(len_ref)
        score_ref[:] = jnp.full_like(score_ref, NEG)
        done_scr[0, 0] = 0

    @pl.when(done_scr[0, 0] == 0)
    def _step():
        is_first = t == 0

        # --- per-stream re-attention + cell (MXU-heavy; independent) ---
        h_news, c_news = [], []
        for s in range(n_streams):
            if profile == "no_attend":
                # stub: mean spatial feature as the context (keeps the
                # feat/embx data-dependence and the cell's input shape,
                # skips scores/softmax/gate; no scalar reduce — Mosaic
                # can't lower full-tensor-to-scalar sums here)
                mean_ctx = jnp.mean(
                    feat_ref[s * n2:(s + 1) * n2].astype(jnp.float32),
                    axis=1)                               # (n2, FS)
                stub_ctx = jnp.concatenate([mean_ctx] * k, axis=0)
                x_full = jnp.concatenate(
                    [embx_scr[s * rows2:(s + 1) * rows2], stub_ctx], axis=1)
            else:
                x_full, _ = _attend_block(
                    embx_scr, h_scr, feat_ref, att1_ref, decw_ref, decb_ref,
                    fullw_ref, fullb_ref, fbw_ref, fbb_ref,
                    k=k, n_img=n2, wdt=wdt, row0=s * rows2, img0=s * n2)
            c_prev = c_scr[s * rows2:(s + 1) * rows2]
            h_prev_b = h_scr[s * rows2:(s + 1) * rows2].astype(wdt)
            if kind == "factored":
                h_new, c_new = _factored_cell_block(
                    x_full, c_prev, h_prev_b,
                    (vw_ref, vb_ref, sw_ref, sb_ref, uw_ref, ub_ref, ww_ref,
                     wb_ref),
                    f_dim=f_dim, h_dim=h_dim, wdt=wdt)
            else:
                # NIC+Att: vw/ww carry W_ih/W_hh, vb/wb b_ih/b_hh (1, 4H)
                h_new, c_new = _lstm_cell_block(
                    x_full, c_prev, h_prev_b,
                    (vw_ref, ww_ref, vb_ref, wb_ref), h_dim=h_dim, wdt=wdt)
            h_news.append(h_new)
            c_news.append(c_new)

        _head_select_embed_phase(
            h_news, c_news, t, is_first,
            cw_ref, cb_ref, emb_ref, tok_ref, len_ref, score_ref,
            h_scr, c_scr, embx_scr, seqs_scr, scores_scr, alive_scr,
            done_scr, k=k, n2=n2, rows2=rows2, n_streams=n_streams,
            n_vt=n_vt, v_tile=v_tile, e_dim=e_dim, h_dim=h_dim,
            max_len=max_len, end_token=end_token, wdt=wdt,
            topk_fn=topk_fn, profile=profile)


def _mega_att_kernel_streamed(
        feat_ref, att1_ref, emb_ref, h0_ref, c0_ref,
        decw_ref, decb_ref, fullw_ref, fullb_ref, fbw_ref, fbb_ref,
        vw_ref, vb_ref, sw_ref, sb_ref, uw_ref, ub_ref, ww_ref, wb_ref,
        cw_ref, cb_ref,
        tok_ref, len_ref, score_ref,
        h_scr, c_scr, embx_scr, seqs_scr, scores_scr, alive_scr, done_scr,
        att2_scr, e_scr, ctx_scr,
        *, kind: str, k: int, n_img: int, f_dim: int, h_dim: int,
        e_dim: int, v_tile: int, vocab: int, max_len: int,
        start_token: int, end_token: int, n_pix: int, n_pix_pad: int,
        p_tile: int, n_streams: int = 1, topk_fold: bool = False):
    """P-STREAMED attention mega kernel — grid ``(n_blocks, T+1, 2*n_pt)``.

    The resident-feature kernel's VMEM wall (KERNELS.md §2: a 32-image
    block's (32, 196, 2048) feature operand wants 147 MB of the 128 MB
    physical VMEM) is an artifact of holding ALL P spatial positions
    resident across steps.  Here the P dimension is tiled over the third
    grid axis and the per-tile feature/att1 blocks stream from HBM every
    step — trading ~1 MB/image/step of (prefetch-overlapped) HBM bandwidth
    for block sizes of 64-128 images, which the head/top-k phase (the
    dominant cost) amortizes far better.  Two passes per step keep the
    softmax EXACT (no online rescaling):

    - q in [0, n_pt):       per-slot attention scores for att1 tile q into
                            ``e_scr`` (rows, P) — elementwise-equal to the
                            resident kernel's scores (the A-dim chunking is
                            identical; P tiling does not cross elements),
    - q == n_pt:            one full-width softmax over ``e_scr`` in place
                            (bit-identical to the resident kernel's),
    - q in [n_pt, 2*n_pt):  context partial ``alpha_tile @ feat_tile``
                            accumulated into ``ctx_scr`` (f32; only the P
                            contraction ORDER differs from the resident
                            kernel's single dot),
    - q == 2*n_pt - 1:      gate, cell, then the shared head/top-k/beam
                            select/embedding tail (``_head_select_embed_
                            phase``), stream-interleaved.

    h/c init from the mean spatial feature is hoisted to XLA (``h0_ref`` /
    ``c0_ref`` per-image operands) since no single tile sees all of P.
    """
    t = pl.program_id(1)
    q = pl.program_id(2)
    n_pt = n_pix_pad // p_tile
    rows = n_img * k
    n2 = n_img // n_streams
    rows2 = n2 * k
    n_vt = vocab // v_tile
    wdt = cw_ref.dtype
    use_fold = topk_fold and v_tile > 128 and (v_tile & (v_tile - 1)) == 0
    topk_fn = _row_topk_fold if use_fold else _row_topk
    a_dim = att1_ref.shape[-1]
    a_tile = 128 if a_dim % 128 == 0 else a_dim

    @pl.when((t == 0) & (q == 0))
    def _init():
        col_l = jax.lax.broadcasted_iota(jnp.int32, (rows, max_len), 1)
        seqs_scr[:] = jnp.where(col_l == 0, start_token, end_token)
        h0 = h0_ref[:]
        c0 = c0_ref[:]
        # stream-major rows: stream s's slot p of local image j at row
        # s*rows2 + p*n2 + j (matches the resident kernel's layout)
        h_scr[:] = jnp.concatenate(
            [h0[s * n2:(s + 1) * n2] for s in range(n_streams)
             for _ in range(k)], axis=0)
        c_scr[:] = jnp.concatenate(
            [c0[s * n2:(s + 1) * n2] for s in range(n_streams)
             for _ in range(k)], axis=0)
        embx_scr[:] = jnp.broadcast_to(
            emb_ref[start_token, :].astype(jnp.float32), (rows, e_dim))
        scores_scr[:] = jnp.zeros_like(scores_scr)
        alive_scr[:] = jnp.ones_like(alive_scr)
        tok_ref[:] = jnp.full_like(tok_ref, end_token)
        len_ref[:] = jnp.ones_like(len_ref)
        score_ref[:] = jnp.full_like(score_ref, NEG)
        done_scr[0, 0] = 0

    @pl.when(done_scr[0, 0] == 0)
    def _step():
        is_first = t == 0

        @pl.when(q == 0)
        def _att2():
            h32 = h_scr[:]
            att2_scr[:] = (jnp.dot(h32.astype(wdt), decw_ref[:],
                                   preferred_element_type=jnp.float32)
                           + decb_ref[0, :])

        @pl.when(q < n_pt)
        def _scores():
            # attention scores for THIS att1 tile, all streams/slots; the
            # per-element math mirrors _attend_block exactly (A chunked at
            # a_tile, f32 accumulation, bias added after).  e_scr is
            # (n_pt, rows, p_tile): the tile index is a LEADING dim so the
            # grid-dynamic q only indexes an untiled dimension.
            fullw_b = jnp.broadcast_to(fullw_ref[:][None],
                                       (n2,) + fullw_ref.shape)
            for s in range(n_streams):
                att1_v = att1_ref[s * n2:(s + 1) * n2]     # (n2, Pt, A)
                for p in range(k):
                    r = s * rows2 + p * n2
                    a2p = att2_scr[r:r + n2].astype(att1_v.dtype)
                    e = jnp.zeros((n2, p_tile, 1), jnp.float32)
                    for a0 in range(0, a_dim, a_tile):
                        a2p_t = a2p[:, a0:a0 + a_tile]
                        r3_t = jnp.maximum(
                            att1_v[:, :, a0:a0 + a_tile]
                            + a2p_t[:, None, :], 0.0)
                        e = e + jax.lax.dot_general(
                            r3_t.astype(wdt), fullw_b[:, a0:a0 + a_tile, :],
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                    e2 = e[:, :, 0] + fullb_ref[0, 0]       # (n2, Pt)
                    if n_pix_pad != n_pix:
                        # padded spatial positions (P padded to a sublane
                        # multiple for the tiled block shape) score NEG:
                        # exp(NEG - max) == 0.0 exactly, so the softmax
                        # over real positions is bit-identical to unpadded
                        gpix = q * p_tile + jax.lax.broadcasted_iota(
                            jnp.int32, (n2, p_tile), 1)
                        e2 = jnp.where(gpix < n_pix, e2, NEG)
                    e_scr[pl.dslice(q, 1), pl.dslice(r, n2), :] = e2[None]

        @pl.when(q >= n_pt)
        def _ctx():
            pt = q - n_pt

            @pl.when(q == n_pt)
            def _softmax():
                # full-width exact softmax, per row — identical math to the
                # resident kernel's jax.nn.softmax over the P axis (static
                # tile reads, lane-concat to (rows, P), per-tile writeback)
                full = jnp.concatenate([e_scr[j] for j in range(n_pt)],
                                       axis=1)              # (rows, P)
                alpha = jax.nn.softmax(full, axis=1)
                for j in range(n_pt):
                    e_scr[j] = alpha[:, j * p_tile:(j + 1) * p_tile]
                ctx_scr[:] = jnp.zeros_like(ctx_scr)

            alpha_full = e_scr[pl.dslice(pt, 1), :, :][0]
            for s in range(n_streams):
                feat_v = feat_ref[s * n2:(s + 1) * n2]      # (n2, Pt, FS)
                for p in range(k):
                    r = s * rows2 + p * n2
                    alpha_t = alpha_full[r:r + n2]
                    part = jax.lax.dot_general(
                        alpha_t[:, None, :].astype(wdt), feat_v,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)[:, 0, :]
                    ctx_scr[r:r + n2] = ctx_scr[r:r + n2] + part

        @pl.when(q == 2 * n_pt - 1)
        def _tail():
            h_news, c_news = [], []
            for s in range(n_streams):
                r0 = s * rows2
                h32 = h_scr[r0:r0 + rows2]
                xs = []
                for p in range(k):
                    sl = slice(p * n2, (p + 1) * n2)
                    gate = jax.nn.sigmoid(
                        jnp.dot(h32[sl].astype(wdt), fbw_ref[:],
                                preferred_element_type=jnp.float32)
                        + fbb_ref[0, :])
                    gctx = gate * ctx_scr[r0 + p * n2:r0 + (p + 1) * n2]
                    xs.append(jnp.concatenate(
                        [embx_scr[r0 + p * n2:r0 + (p + 1) * n2], gctx],
                        axis=1))
                x_full = jnp.concatenate(xs, axis=0)        # (rows2, E+FS)
                c_prev = c_scr[r0:r0 + rows2]
                h_prev_b = h32.astype(wdt)
                if kind == "factored":
                    h_new, c_new = _factored_cell_block(
                        x_full, c_prev, h_prev_b,
                        (vw_ref, vb_ref, sw_ref, sb_ref, uw_ref, ub_ref,
                         ww_ref, wb_ref), f_dim=f_dim, h_dim=h_dim, wdt=wdt)
                else:
                    h_new, c_new = _lstm_cell_block(
                        x_full, c_prev, h_prev_b,
                        (vw_ref, ww_ref, vb_ref, wb_ref), h_dim=h_dim,
                        wdt=wdt)
                h_news.append(h_new)
                c_news.append(c_new)

            _head_select_embed_phase(
                h_news, c_news, t, is_first,
                cw_ref, cb_ref, emb_ref, tok_ref, len_ref, score_ref,
                h_scr, c_scr, embx_scr, seqs_scr, scores_scr, alive_scr,
                done_scr, k=k, n2=n2, rows2=rows2, n_streams=n_streams,
                n_vt=n_vt, v_tile=v_tile, e_dim=e_dim, h_dim=h_dim,
                max_len=max_len, end_token=end_token, wdt=wdt,
                topk_fn=topk_fn, profile="full")


@functools.partial(
    jax.jit,
    static_argnames=("batch", "start_token", "end_token", "k",
                     "max_seq_length", "n_img_block", "v_tile", "kind",
                     "n_streams", "topk_fold", "interpret", "_profile",
                     "p_stream", "p_tile"))
def mega_att_beam_decode(
    params: dict,            # full attention-decoder params
    features: jax.Array,     # (B, P, FS) per-image spatial features
    style: jax.Array,
    batch: int,
    start_token: int = 1,
    end_token: int = 2,
    k: int = 5,
    max_seq_length: int = 40,
    n_img_block: int = 24,
    v_tile: int = 2048,
    kind: str = "factored",
    n_streams: int = 1,
    topk_fold: bool = False,
    interpret: bool = False,
    _profile: str = "full",
    p_stream: bool = False,
    p_tile: int = 0,
):
    """Whole attention-beam-search-in-one-kernel decode.

    ``kind="factored"``: StyleNet+Att (stacked styles, ``style`` selects);
    ``kind="lstm"``: NIC+Att (torch LSTMCell, single attention net).
    Token-identical to ``beam_search_batched`` over
    ``factored_att_decode_step`` / ``rnn_att_decode_step`` (research
    semantics: step 1 embeds ``<start>``); returns :class:`BeamResult`.

    ``p_stream=True`` selects the P-STREAMED kernel
    (:func:`_mega_att_kernel_streamed`): features/att1 stream from HBM in
    P tiles instead of staying VMEM-resident, unlocking 64-128-image
    blocks past the resident kernel's 24-image VMEM wall.  ``p_tile``
    (0 = 32) must be sublane-divisible on hardware; P pads to a p_tile
    multiple with exact NEG masking (P=196 -> 224, 7 tiles).  The only
    numerical difference vs the resident kernel is the P contraction
    ORDER of the context dot (scores and softmax are bit-identical);
    tested token-exact on the parity suite sizes.
    """
    from icee_tpu.decode.beam import BeamResult
    from icee_tpu.models.attention import _select_attention

    if kind == "factored":
        emb = params["B"]
        h_dim = params["W_w"].shape[0]
        f_dim = params["U_w"].shape[1]
        cw_full, cb_full = params["C_w"], params["C_b"]
    else:
        emb = params["embed"]
        h_dim = params["cell"]["W_hh"].shape[0]
        f_dim = h_dim
        cw_full, cb_full = params["linear_w"], params["linear_b"]
    vocab, e_dim = emb.shape
    wdt = cw_full.dtype
    max_len = max_seq_length + 2
    n_pix, fs = features.shape[1], features.shape[2]

    n_img_block = min(n_img_block, batch)
    if n_img_block % n_streams:
        import warnings

        warnings.warn(
            f"mega_att_beam_decode: n_streams={n_streams} does not divide "
            f"n_img_block={n_img_block}; running single-stream", stacklevel=2)
        n_streams = 1
    # Mosaic's tpu.concatenate can't mix sublane offsets on the non-concat
    # dim: the per-slot x/att2 slices start at row p*(n_img/n_streams), so
    # on hardware each stream's image count must be a multiple of the 8-row
    # sublane tile (interpret mode has no layout constraint, but warn there
    # too so interpret-tested configs correspond to compiled behavior).
    if n_streams > 1 and (n_img_block // n_streams) % 8:
        import warnings

        warnings.warn(
            f"mega_att_beam_decode: n_img_block/n_streams = "
            f"{n_img_block // n_streams} is not sublane-aligned (8); "
            f"hardware runs single-stream"
            + (" (interpret mode keeps the requested streams)"
               if interpret else ""), stacklevel=2)
        if not interpret:
            n_streams = 1
    bp = -(-batch // n_img_block) * n_img_block
    n_blocks = bp // n_img_block
    rows_blk = n_img_block * k

    v_tile = min(v_tile, -(-vocab // 128) * 128)
    vp = -(-vocab // v_tile) * v_tile
    cw = cw_full
    cb = cb_full.reshape(1, -1).astype(jnp.float32)
    if vp != vocab:
        cw = jnp.pad(cw, ((0, 0), (0, vp - vocab)))
        cb = jnp.pad(cb, ((0, 0), (0, vp - vocab)),
                     constant_values=float(NEG))
        emb = jnp.pad(emb, ((0, vp - vocab), (0, 0)))

    feats = features.astype(wdt)
    if bp != batch:
        feats = jnp.pad(feats, ((0, bp - batch), (0, 0), (0, 0)))
    if kind == "factored":
        att = _select_attention(params["attention"], style)
        cell_ws = [params["V_w"], params["V_b"],
                   jnp.take(params["S_w"], style, axis=0),
                   jnp.take(params["S_b"], style, axis=0),
                   params["U_w"], params["U_b"],
                   params["W_w"], params["W_b"]]
        cell_shapes = [(e_dim + fs, 4 * f_dim), (4, f_dim),
                       (4, f_dim, f_dim), (4, f_dim),
                       (4, f_dim, h_dim), (4, h_dim),
                       (h_dim, 4 * h_dim), (4, h_dim)]
    else:
        att = params["attention"]
        dummy = jnp.zeros((1, 1), wdt)
        lc = params["cell"]
        cell_ws = [lc["W_ih"], lc["b_ih"].reshape(1, -1),
                   dummy, dummy, dummy, dummy,
                   lc["W_hh"], lc["b_hh"].reshape(1, -1)]
        cell_shapes = [(e_dim + fs, 4 * h_dim), (1, 4 * h_dim),
                       (1, 1), (1, 1), (1, 1), (1, 1),
                       (h_dim, 4 * h_dim), (1, 4 * h_dim)]
    att1 = (feats @ att["enc_w"] + att["enc_b"]).astype(wdt)
    a_dim = att1.shape[2]

    if p_stream:
        # Mosaic requires tiled block dims divisible by the (8, 128)
        # sublane/lane tile, so the P axis pads to a p_tile multiple and
        # padded positions are NEG-masked in-kernel (exact: exp(NEG-max)
        # is 0.0).  Default 32 => P=196 pads to 224, 7 tiles.
        if p_tile <= 0:
            p_tile = min(32, -(-n_pix // 8) * 8)
        n_pt = -(-n_pix // p_tile)
        n_pix_pad = n_pt * p_tile

        # h/c init hoisted to XLA (same op sequence as the resident
        # kernel's in-kernel _init: f32 mean of the wdt features, wdt
        # matmul with f32 accumulation, rounded back through wdt) — from
        # the UNPADDED features
        mean = jnp.mean(feats.astype(jnp.float32), axis=1).astype(wdt)
        ih_w, ih_b = params["init_h_w"], params["init_h_b"]
        ic_w, ic_b = params["init_c_w"], params["init_c_b"]
        h0 = (jnp.dot(mean, ih_w, preferred_element_type=jnp.float32)
              + ih_b).astype(wdt).astype(jnp.float32)
        c0 = (jnp.dot(mean, ic_w, preferred_element_type=jnp.float32)
              + ic_b).astype(wdt).astype(jnp.float32)

        feats_p, att1_p = feats, att1
        if n_pix_pad != n_pix:
            feats_p = jnp.pad(feats, ((0, 0), (0, n_pix_pad - n_pix),
                                      (0, 0)))
            att1_p = jnp.pad(att1, ((0, 0), (0, n_pix_pad - n_pix), (0, 0)))

        vmem = pltpu.VMEM
        fullq = lambda *shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i, t, q: tuple([0] * len(shape)),
            memory_space=vmem)
        imgq = lambda w: pl.BlockSpec(  # noqa: E731
            (n_img_block, w), lambda i, t, q: (i, 0), memory_space=vmem)
        feat_spec = pl.BlockSpec(
            (n_img_block, p_tile, fs),
            lambda i, t, q: (i, jnp.maximum(q - n_pt, 0), 0),
            memory_space=vmem)
        att1_spec = pl.BlockSpec(
            (n_img_block, p_tile, a_dim),
            lambda i, t, q: (i, jnp.minimum(q, n_pt - 1), 0),
            memory_space=vmem)

        kernel = functools.partial(
            _mega_att_kernel_streamed, kind=kind, k=k, n_img=n_img_block,
            f_dim=f_dim, h_dim=h_dim, e_dim=e_dim, v_tile=v_tile, vocab=vp,
            max_len=max_len, start_token=start_token, end_token=end_token,
            n_pix=n_pix, n_pix_pad=n_pix_pad, p_tile=p_tile,
            n_streams=n_streams, topk_fold=topk_fold)
        out_shape = (
            jax.ShapeDtypeStruct((bp, max_len), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        )
        call = pl.pallas_call(
            kernel,
            grid=(n_blocks, max_seq_length + 1, 2 * n_pt),
            in_specs=[
                feat_spec, att1_spec,
                fullq(vp, e_dim),
                imgq(h_dim), imgq(h_dim),             # h0, c0
                fullq(h_dim, a_dim), fullq(1, a_dim),
                fullq(a_dim, 1), fullq(1, 1),
                fullq(h_dim, fs), fullq(1, fs),
            ] + [fullq(*sh) for sh in cell_shapes] + [
                fullq(h_dim, vp), fullq(1, vp),
            ],
            out_specs=(
                pl.BlockSpec((n_img_block, max_len),
                             lambda i, t, q: (i, 0), memory_space=vmem),
                pl.BlockSpec((n_img_block, 1), lambda i, t, q: (i, 0),
                             memory_space=vmem),
                pl.BlockSpec((n_img_block, 1), lambda i, t, q: (i, 0),
                             memory_space=vmem),
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_blk, h_dim), jnp.float32),   # h
                pltpu.VMEM((rows_blk, h_dim), jnp.float32),   # c
                pltpu.VMEM((rows_blk, e_dim), jnp.float32),   # embx
                pltpu.VMEM((rows_blk, max_len), jnp.int32),   # seqs
                pltpu.VMEM((n_img_block, k), jnp.float32),    # beam scores
                pltpu.VMEM((n_img_block, k), jnp.int32),      # alive
                pltpu.SMEM((1, 1), jnp.int32),                # done
                pltpu.VMEM((rows_blk, a_dim), jnp.float32),   # att2
                pltpu.VMEM((n_pt, rows_blk, p_tile), jnp.float32),  # e/alpha
                pltpu.VMEM((rows_blk, fs), jnp.float32),      # ctx
            ],
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )
        tokens, lengths, scores = call(
            feats_p, att1_p, emb, h0, c0,
            att["dec_w"], att["dec_b"].reshape(1, -1),
            att["full_w"].reshape(-1, 1),
            att["full_b"].reshape(1, 1).astype(jnp.float32),
            params["f_beta_w"], params["f_beta_b"].reshape(1, -1),
            *cell_ws, cw, cb)
        return BeamResult(tokens=tokens[:batch],
                          length=lengths[:batch, 0],
                          score=scores[:batch, 0])

    vmem = pltpu.VMEM
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, t: tuple([0] * len(shape)), memory_space=vmem)
    img3 = lambda p_, w: pl.BlockSpec(  # noqa: E731
        (n_img_block, p_, w), lambda i, t: (i, 0, 0), memory_space=vmem)
    img = lambda w: pl.BlockSpec((n_img_block, w), lambda i, t: (i, 0),  # noqa: E731
                                 memory_space=vmem)

    kernel = functools.partial(
        _mega_att_kernel, kind=kind, k=k, n_img=n_img_block, f_dim=f_dim,
        h_dim=h_dim, e_dim=e_dim, v_tile=v_tile, vocab=vp, max_len=max_len,
        start_token=start_token, end_token=end_token, n_streams=n_streams,
        topk_fold=topk_fold, profile=_profile)
    out_shape = (
        jax.ShapeDtypeStruct((bp, max_len), jnp.int32),
        jax.ShapeDtypeStruct((bp, 1), jnp.int32),
        jax.ShapeDtypeStruct((bp, 1), jnp.float32),
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks, max_seq_length + 1),
        in_specs=[
            img3(n_pix, fs), img3(n_pix, a_dim),
            full(vp, e_dim),
            full(h_dim, a_dim), full(1, a_dim),
            full(a_dim, 1), full(1, 1),
            full(h_dim, fs), full(1, fs),
            full(fs, h_dim), full(1, h_dim),      # init_h
            full(fs, h_dim), full(1, h_dim),      # init_c
        ] + [full(*sh) for sh in cell_shapes] + [
            full(h_dim, vp), full(1, vp),
        ],
        out_specs=(img(max_len), img(1), img(1)),
        scratch_shapes=[
            pltpu.VMEM((rows_blk, h_dim), jnp.float32),
            pltpu.VMEM((rows_blk, h_dim), jnp.float32),
            pltpu.VMEM((rows_blk, e_dim), jnp.float32),
            pltpu.VMEM((rows_blk, max_len), jnp.int32),
            pltpu.VMEM((n_img_block, k), jnp.float32),
            pltpu.VMEM((n_img_block, k), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    tokens, lengths, scores = call(
        feats, att1, emb,
        att["dec_w"], att["dec_b"].reshape(1, -1),
        att["full_w"].reshape(-1, 1),
        att["full_b"].reshape(1, 1).astype(jnp.float32),
        params["f_beta_w"], params["f_beta_b"].reshape(1, -1),
        params["init_h_w"], params["init_h_b"].reshape(1, -1),
        params["init_c_w"], params["init_c_b"].reshape(1, -1),
        *cell_ws, cw, cb)
    return BeamResult(tokens=tokens[:batch],
                      length=lengths[:batch, 0],
                      score=scores[:batch, 0])
