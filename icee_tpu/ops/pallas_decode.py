"""Pallas TPU kernel: fused FactoredLSTM decode step with streaming top-k.

The beam/greedy hot loop (``stylenet/model.py:222-231``) per step is:
cell (V->S->U + W chain, gates) -> output head ``C`` (H x V) -> log_softmax
-> top-k.  The XLA version materializes (rows, V) logits to HBM and runs a
sort-based top-k — on TPU the selection costs as much as the matmuls (bench
profiling: 13ms compute vs 11ms selection per 41-step batch-256 decode).

This kernel fuses the whole step:

- grid = (row_blocks, vocab_tiles); the recurrent cell computes once per row
  block (first vocab tile) into VMEM scratch,
- each vocab tile's logits ``h' @ C[:, tile]`` stay in VMEM and feed a
  *streaming* exact top-k (iterative max + first-index tie-break, matching
  ``lax.top_k``/torch ordering) plus a running max/sum-exp for the
  log-softmax normalizer,
- outputs are the per-row top-k log-probabilities + global vocab indices and
  the new (h, c) — the (rows, V) logits never touch HBM.

Exactness: top-k of a union of tiles == merge of per-tile top-k; the
normalizer is exact f32 logsumexp (streaming rescale).  Equivalence with the
XLA reference path is tested in ``tests/test_pallas.py`` (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _row_topk(tile: jax.Array, base: jax.Array, ktop: int, tile_max=None):
    """Exact per-row top-k of ``tile`` (R, W) -> ((R, ktop) vals,
    (R, ktop) global indices offset by ``base``).  Ties -> lowest index,
    matching lax.top_k / torch.topk.  ``tile_max`` (R, 1), if given, is the
    precomputed row max (the streaming-logsumexp pass already has it),
    saving the first full-width reduction."""
    r, w = tile.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    cur = tile
    vals, idxs = [], []
    for it in range(ktop):
        m = tile_max if (it == 0 and tile_max is not None) else jnp.max(
            cur, axis=1, keepdims=True)
        ismax = cur == m
        idx = jnp.min(jnp.where(ismax, col, jnp.int32(2**30)), axis=1,
                      keepdims=True)
        vals.append(m)
        idxs.append(idx + base)
        if it + 1 < ktop:  # the final mask pass is never read
            cur = jnp.where(col == idx, NEG, cur)
    return jnp.concatenate(vals, 1), jnp.concatenate(idxs, 1)


def _row_topk_fold(tile: jax.Array, base: jax.Array, ktop: int,
                   tile_max=None, fold_to: int = 128):
    """Exact per-row top-k via a binary tournament fold.

    Semantically identical to :func:`_row_topk` (ties -> lowest index) but
    replaces each iteration's two full-width reduces with a (val, idx) fold
    down to ``fold_to`` lanes: compare/select pairs on geometrically
    shrinking widths (W/2 + W/4 + ... element-ops instead of reduce passes
    over W), then the max/index-find reduces on only the ``fold_to``-wide
    remainder.  Exactness: the fold keeps, per surviving lane, the
    subtree's max with its lowest column index, so min-index among
    max-valued survivors equals the tile's argmax with lax.top_k/torch
    tie-break.

    Requires W a power of two > ``fold_to``; callers fall back to
    :func:`_row_topk` otherwise.  ``tile_max`` is accepted for signature
    compatibility (the fold produces the max itself).
    """
    del tile_max
    r, w = tile.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    if w > fold_to:
        # materialize the iota with a data-dependent zero: Mosaic lays a
        # bare broadcasted_iota out sublane-broadcast, and lane-slicing that
        # layout crashes ApplyVectorLayout (probed: compiler SIGABRT
        # "Check failed: limits[i] <= dim(i)"; same workaround as the
        # profile stub in ops/pallas_beam.py).  Non-finite logits are zeroed
        # before the *0.0 so a +/-inf or NaN value cannot poison the int
        # cast (inf*0 = NaN, and int(NaN) is undefined).
        finite = jnp.where(jnp.abs(tile) < jnp.inf, tile, 0.0)
        col = col + (finite * 0.0).astype(jnp.int32)
    cur = tile
    vals, idxs = [], []
    for it in range(ktop):
        v, i = cur, col
        ww = w
        while ww > fold_to:
            h = ww // 2
            v1, v2 = v[:, :h], v[:, h:ww]
            i1, i2 = i[:, :h], i[:, h:ww]
            take = (v1 > v2) | ((v1 == v2) & (i1 < i2))
            v = jnp.where(take, v1, v2)
            i = jnp.where(take, i1, i2)
            ww = h
        m = jnp.max(v, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(v == m, i, jnp.int32(2**30)), axis=1,
                      keepdims=True)
        vals.append(m)
        idxs.append(idx + base)
        if it + 1 < ktop:
            cur = jnp.where(col == idx, NEG, cur)
    return jnp.concatenate(vals, 1), jnp.concatenate(idxs, 1)


def _row_topk_running(tile: jax.Array, base: jax.Array, ktop: int,
                      tile_max=None, chunk: int = 128):
    """ONE-tile-read exact top-k: stream the tile in ``chunk``-lane slices,
    maintaining ``ktop`` elementwise-sorted running (val, idx) vectors via
    compare/select bubble insertion (ties keep the earlier chunk = the
    lower index); the exact row top-k is then extracted from the
    (rows, ktop*chunk) remnant only.

    Exactness: any value in the row's global top-k ranks within the top-k
    of its own lane position across chunks (fewer than ktop values in the
    whole row exceed it), so it survives into the remnant; the remnant
    extraction uses the same min-global-index tie-break as lax.top_k.
    Unlike :func:`_row_topk`'s ktop re-reads of the masked tile, the tile
    is read ONCE; the trade is ktop compare/select stages (5 vreg ops
    each) per chunk.  Measured head-to-head in ``scripts/probe_topk.py``.
    """
    del tile_max
    r, w = tile.shape
    r_vals = [jnp.full((r, chunk), NEG, jnp.float32) for _ in range(ktop)]
    r_idx = [jnp.zeros((r, chunk), jnp.int32) for _ in range(ktop)]
    col0 = jax.lax.broadcasted_iota(jnp.int32, (r, chunk), 1)
    for c0 in range(0, w, chunk):
        nv = tile[:, c0:c0 + chunk]
        ni = col0 + c0
        for j in range(ktop):
            swap = nv > r_vals[j]          # strict: ties keep lower index
            v_hi = jnp.where(swap, nv, r_vals[j])
            i_hi = jnp.where(swap, ni, r_idx[j])
            nv = jnp.where(swap, r_vals[j], nv)
            ni = jnp.where(swap, r_idx[j], ni)
            r_vals[j], r_idx[j] = v_hi, i_hi
    rem_v = jnp.concatenate(r_vals, axis=1)           # (r, ktop*chunk)
    rem_i = jnp.concatenate(r_idx, axis=1)
    slot_col = jax.lax.broadcasted_iota(jnp.int32, rem_v.shape, 1)
    vals, idxs = [], []
    cur = rem_v
    for it in range(ktop):
        m = jnp.max(cur, axis=1, keepdims=True)
        ismax = cur == m
        pick = jnp.min(jnp.where(ismax, rem_i, jnp.int32(2**30)), axis=1,
                       keepdims=True)
        vals.append(m)
        idxs.append(pick + base)
        if it + 1 < ktop:
            slot = jnp.min(jnp.where(ismax & (rem_i == pick), slot_col,
                                     jnp.int32(2**30)), axis=1,
                           keepdims=True)
            cur = jnp.where(slot_col == slot, NEG, cur)
    return jnp.concatenate(vals, 1), jnp.concatenate(idxs, 1)


def _merge_topk(v1, i1, v2, i2, ktop: int):
    """Merge two (R, ktop) sorted-ish candidate sets -> exact top-k.
    Tie-break: lower global index first (both inputs carry global indices)."""
    v = jnp.concatenate([v1, v2], axis=1)
    i = jnp.concatenate([i1, i2], axis=1)
    r, w = v.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    vals, idxs = [], []
    cur = v
    for _ in range(ktop):
        m = jnp.max(cur, axis=1, keepdims=True)
        ismax = cur == m
        # among max-valued slots pick the one with the smallest global index
        cand_idx = jnp.where(ismax, i, jnp.int32(2**30))
        pick = jnp.min(cand_idx, axis=1, keepdims=True)
        # mask exactly one slot (the picked one)
        slot = jnp.where(ismax & (i == pick), col, jnp.int32(2**30))
        slot = jnp.min(slot, axis=1, keepdims=True)
        vals.append(m)
        idxs.append(pick)
        cur = jnp.where(col == slot, NEG, cur)
    return jnp.concatenate(vals, 1), jnp.concatenate(idxs, 1)


def _kernel(x_ref, h_ref, c_ref,
            vw_ref, vb_ref, sw_ref, sb_ref, uw_ref, ub_ref, ww_ref, wb_ref,
            cw_ref, cb_ref,
            topv_ref, topi_ref, h_out_ref, c_out_ref,
            h_scr, c_scr, runv_scr, runi_scr, m_scr, se_scr,
            *, ktop: int, f_dim: int, h_dim: int, v_tile: int, vocab: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _cell():
        x = x_ref[:]
        h = h_ref[:]
        c = c_ref[:]
        v_all = jnp.dot(x, vw_ref[:], preferred_element_type=jnp.float32)
        w_all = jnp.dot(h, ww_ref[:], preferred_element_type=jnp.float32)
        # Mosaic has no batched matmul with mismatched batch dims: unroll the
        # 4 gates into plain 2-D dots (static Python loop)
        z = []
        for g in range(4):
            v_g = v_all[:, g * f_dim:(g + 1) * f_dim] + vb_ref[g, :]
            s_g = jnp.dot(v_g.astype(sw_ref.dtype), sw_ref[g],
                          preferred_element_type=jnp.float32) + sb_ref[g, :]
            u_g = jnp.dot(s_g.astype(uw_ref.dtype), uw_ref[g],
                          preferred_element_type=jnp.float32) + ub_ref[g, :]
            z.append(u_g + w_all[:, g * h_dim:(g + 1) * h_dim] + wb_ref[g, :])
        i_t = jax.nn.sigmoid(z[0])
        f_t = jax.nn.sigmoid(z[1])
        o_t = jax.nn.sigmoid(z[2])
        g_t = jnp.tanh(z[3])
        c_new = f_t * c.astype(jnp.float32) + i_t * g_t
        h_new = o_t * c_new  # reference quirk: no tanh (model.py:153)
        h_scr[:] = h_new
        c_scr[:] = c_new
        h_out_ref[:] = h_new.astype(h_out_ref.dtype)
        c_out_ref[:] = c_new.astype(c_out_ref.dtype)
        runv_scr[:] = jnp.full_like(runv_scr, NEG)
        runi_scr[:] = jnp.zeros_like(runi_scr)
        m_scr[:] = jnp.full_like(m_scr, NEG)
        se_scr[:] = jnp.zeros_like(se_scr)

    # logits for this vocab tile, in f32, never leaving VMEM
    logits = jnp.dot(h_scr[:].astype(cw_ref.dtype), cw_ref[:],
                     preferred_element_type=jnp.float32) + cb_ref[:]
    # mask padded columns of a ragged final tile out of max/sumexp/topk
    col_global = j * v_tile + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 1)
    logits = jnp.where(col_global < vocab, logits, NEG)

    # streaming logsumexp
    tile_max = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_scr[:], tile_max)
    se_scr[:] = se_scr[:] * jnp.exp(m_scr[:] - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_scr[:] = m_new

    # streaming exact top-k (reusing the logsumexp pass's tile max)
    tv, ti = _row_topk(logits, j * v_tile, ktop, tile_max=tile_max)
    mv, mi = _merge_topk(runv_scr[:], runi_scr[:], tv, ti, ktop)
    runv_scr[:] = mv
    runi_scr[:] = mi

    @pl.when(j == pl.num_programs(1) - 1)
    def _emit():
        logz = m_scr[:] + jnp.log(se_scr[:])
        topv_ref[:] = runv_scr[:] - logz
        topi_ref[:] = runi_scr[:]


@functools.partial(jax.jit,
                   static_argnames=("ktop", "row_block", "v_tile", "interpret"))
def fused_decode_step_topk(
    params: dict,
    x: jax.Array,          # (R, E)
    h: jax.Array,          # (R, H)
    c: jax.Array,          # (R, H)
    style: jax.Array,
    ktop: int = 5,
    row_block: int = 256,
    v_tile: int = 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """-> (logp_top (R, ktop) f32, idx_top (R, ktop) i32, h', c').

    ``logp_top`` are log-softmax values of the top-``ktop`` vocabulary
    entries per row, descending; ``idx_top`` their vocab ids.
    """
    rows, e = x.shape
    h_dim = h.shape[-1]
    f_dim = params["U_w"].shape[1]
    vocab = params["C_w"].shape[-1]
    if rows % row_block:
        row_block = rows  # small calls: single block
    n_rows = rows // row_block
    n_vt = -(-vocab // v_tile)

    s_w = jnp.take(params["S_w"], style, axis=0)
    s_b = jnp.take(params["S_b"], style, axis=0)

    grid = (n_rows, n_vt)
    row_spec = lambda i, j: (i, 0)  # noqa: E731
    const_spec = lambda i, j: tuple([0] * 1)  # noqa: E731

    kernel = functools.partial(_kernel, ktop=ktop, f_dim=f_dim, h_dim=h_dim,
                               v_tile=v_tile, vocab=vocab)
    out_shape = (
        jax.ShapeDtypeStruct((rows, ktop), jnp.float32),
        jax.ShapeDtypeStruct((rows, ktop), jnp.int32),
        jax.ShapeDtypeStruct((rows, h_dim), h.dtype),
        jax.ShapeDtypeStruct((rows, h_dim), c.dtype),
    )
    vmem = pltpu.VMEM
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_block, e), row_spec, memory_space=vmem),      # x
            pl.BlockSpec((row_block, h_dim), row_spec, memory_space=vmem),  # h
            pl.BlockSpec((row_block, h_dim), row_spec, memory_space=vmem),  # c
            pl.BlockSpec((e, 4 * f_dim), lambda i, j: (0, 0),
                         memory_space=vmem),                                # V_w
            pl.BlockSpec((4, f_dim), lambda i, j: (0, 0),
                         memory_space=vmem),                                # V_b
            pl.BlockSpec((4, f_dim, f_dim), lambda i, j: (0, 0, 0),
                         memory_space=vmem),                                # S_w
            pl.BlockSpec((4, f_dim), lambda i, j: (0, 0),
                         memory_space=vmem),                                # S_b
            pl.BlockSpec((4, f_dim, h_dim), lambda i, j: (0, 0, 0),
                         memory_space=vmem),                                # U_w
            pl.BlockSpec((4, h_dim), lambda i, j: (0, 0),
                         memory_space=vmem),                                # U_b
            pl.BlockSpec((h_dim, 4 * h_dim), lambda i, j: (0, 0),
                         memory_space=vmem),                                # W_w
            pl.BlockSpec((4, h_dim), lambda i, j: (0, 0),
                         memory_space=vmem),                                # W_b
            pl.BlockSpec((h_dim, v_tile), lambda i, j: (0, j),
                         memory_space=vmem),                                # C_w
            pl.BlockSpec((v_tile,), lambda i, j: (j,),
                         memory_space=vmem),                                # C_b
        ],
        out_specs=(
            pl.BlockSpec((row_block, ktop), row_spec, memory_space=vmem),
            pl.BlockSpec((row_block, ktop), row_spec, memory_space=vmem),
            pl.BlockSpec((row_block, h_dim), row_spec, memory_space=vmem),
            pl.BlockSpec((row_block, h_dim), row_spec, memory_space=vmem),
        ),
        scratch_shapes=[
            pltpu.VMEM((row_block, h_dim), jnp.float32),   # h'
            pltpu.VMEM((row_block, h_dim), jnp.float32),   # c'
            pltpu.VMEM((row_block, ktop), jnp.float32),    # running top vals
            pltpu.VMEM((row_block, ktop), jnp.int32),      # running top idx
            pltpu.VMEM((row_block, 1), jnp.float32),       # running max
            pltpu.VMEM((row_block, 1), jnp.float32),       # running sumexp
        ],
        out_shape=out_shape,
        interpret=interpret,
    )
    return call(x, h, c,
                params["V_w"], params["V_b"], s_w, s_b,
                params["U_w"], params["U_b"], params["W_w"], params["W_b"],
                params["C_w"], params["C_b"])


def reference_step_topk(params, x, h, c, style, ktop: int = 5):
    """Pure-XLA reference: cell + head + log_softmax + top-k (test oracle)."""
    from icee_tpu.ops.cells import factored_lstm_cell

    h2, c2 = factored_lstm_cell(params, x, h, c, style)
    logits = h2 @ params["C_w"] + params["C_b"]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, idx = jax.lax.top_k(logp, ktop)
    return vals, idx, h2, c2
