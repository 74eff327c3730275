"""Pallas TPU kernel: fused teacher-forced SentiCap mRNN training scan.

The SentiCap recurrence (``senticap/mrnn/mrnn.py:404-440``, rebuilt as
:func:`icee_tpu.senticap.model.cell`) is one fused ``[x ; clip(h)] @ w_lstm``
matmul per step, gate order [i, f, o, cellcand], ``hh = og * cc`` (no tanh
on h).  The XLA ``lax.scan`` re-reads the (E+H, 4H) weight from HBM every
timestep in BOTH directions and round-trips the dW accumulator per step —
at the MTurk regime (B=128, T=22, H=512) that is ~8.4 MB x 22 x ~4 of pure
weight traffic per path per step.  The SWITCHED model
(``mrnn_switched.py:792-808``) runs two INDEPENDENT copies of this
recurrence (the switch gate mixes their outputs but never feeds back), so
one single-path kernel covers the base model and both switched paths.

- ``_fwd_kernel``: grid ``(B/tile_b, T)``; w_lstm VMEM-resident across the
  whole scan, (h, c) carried in f32 scratch, emits the h and c sequences
  (the backward's residuals).
- ``_bwd_kernel``: reversed time index maps; recomputes the gates from the
  saved (x, h_prev, c_prev), chains (dh, dc) through scratch, accumulates
  dW in VMEM, and applies the reference's ``GradClip`` semantics
  (``mrnn_util.py:78-98`` via :func:`icee_tpu.senticap.model.grad_clip_act`):
  the gradient flowing into ``h_prev`` THROUGH THE CELL is elementwise
  clamped to ``+-gclip``; the output cotangent (head/loss path) is not.

The step input ``x_seq`` is precomputed OUTSIDE (visual pseudo-word at
step 0, embedding rows elsewhere, input-dropout mask folded in), so the
wemb/wvm gradients scatter through XLA autodiff.  The BATCH_NORM affine
quirk branch stays on the XLA scan (callers guard).

Exact-f32 parity with ``jax.grad`` of the XLA scan is tested in interpret
mode (``tests/test_pallas_senticap_train.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from icee_tpu.ops.kernel_common import (
    auto_batch_tile as _auto_tile,
    resolve_interpret as _resolve_interpret,
)


def _gates(x, h_prev, w_ref, h_dim, wdt):
    """z = [x ; h] @ w_lstm split into [i, f, o, cellcand] (f32).  The
    concat happens IN-kernel (lane axis) so the single fused dot matches
    the XLA cell's reduction order exactly (``model.py:112-115``)."""
    in_state = jnp.concatenate([x.astype(wdt), h_prev.astype(wdt)], axis=1)
    z = jnp.dot(in_state, w_ref[:],
                preferred_element_type=jnp.float32)
    i_t = jax.nn.sigmoid(z[:, :h_dim])
    f_t = jax.nn.sigmoid(z[:, h_dim:2 * h_dim])
    o_t = jax.nn.sigmoid(z[:, 2 * h_dim:3 * h_dim])
    g_t = jnp.tanh(z[:, 3 * h_dim:])
    return i_t, f_t, o_t, g_t


def _fwd_kernel(x_ref, w_ref, h_out_ref, c_out_ref, h_scr, c_scr,
                *, h_dim: int):
    t = pl.program_id(1)
    wdt = w_ref.dtype

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    x = x_ref[0].astype(jnp.float32)
    i_t, f_t, o_t, g_t = _gates(x, h_scr[:], w_ref, h_dim, wdt)
    c_new = f_t * c_scr[:] + i_t * g_t
    h_new = o_t * c_new                       # reference quirk: no tanh
    h_out_ref[0] = h_new.astype(h_out_ref.dtype)
    c_out_ref[0] = c_new.astype(c_out_ref.dtype)
    h_scr[:] = h_out_ref[0].astype(jnp.float32)
    c_scr[:] = c_out_ref[0].astype(jnp.float32)


def _bwd_kernel(x_ref, hp_ref, cp_ref, c_ref, dh_ref, w_ref,
                dx_ref, dw_ref, dh_scr, dc_scr,
                *, h_dim: int, seq_len: int, gclip: float):
    bt = pl.program_id(0)
    g_idx = pl.program_id(1)
    s = seq_len - 1 - g_idx
    wdt = w_ref.dtype
    e_dim = x_ref.shape[2]

    @pl.when((bt == 0) & (g_idx == 0))
    def _init_acc():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(g_idx == 0)
    def _init_scr():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    first = s == 0
    zero_f = jnp.float32(0.0)
    h_prev = jnp.where(first, zero_f, hp_ref[0].astype(jnp.float32))
    c_prev = jnp.where(first, zero_f, cp_ref[0].astype(jnp.float32))
    x = x_ref[0].astype(jnp.float32)
    c_new = c_ref[0].astype(jnp.float32)

    i_t, f_t, o_t, g_t = _gates(x, h_prev, w_ref, h_dim, wdt)

    # dh_scr holds the CLIPPED recurrent gradient from step s+1 (the
    # GradClip custom op sits between h_s and its use as h_prev at s+1);
    # the output cotangent dh_ref is not clipped.
    dh_total = dh_ref[0].astype(jnp.float32) + dh_scr[:]
    d_o = dh_total * c_new
    dc_new = dh_total * o_t + dc_scr[:]
    d_f = dc_new * c_prev
    d_i = dc_new * g_t
    d_g = dc_new * i_t
    dc_scr[:] = dc_new * f_t

    dz = jnp.concatenate(
        [d_i * i_t * (1.0 - i_t),
         d_f * f_t * (1.0 - f_t),
         d_o * o_t * (1.0 - o_t),
         d_g * (1.0 - g_t * g_t)], axis=1)                # (n, 4H)
    dz_w = dz.astype(wdt)

    dw_ref[:e_dim, :] += jnp.dot(x.astype(wdt).T, dz_w,
                                 preferred_element_type=jnp.float32)
    dw_ref[e_dim:, :] += jnp.dot(h_prev.astype(wdt).T, dz_w,
                                 preferred_element_type=jnp.float32)
    dx_ref[0] = jnp.dot(dz_w, w_ref[:e_dim, :].T,
                        preferred_element_type=jnp.float32
                        ).astype(dx_ref.dtype)
    dh_c = jnp.dot(dz_w, w_ref[e_dim:, :].T,
                   preferred_element_type=jnp.float32)
    dh_scr[:] = jnp.clip(dh_c, -gclip, gclip)             # GradClip


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_senticap_scan(w_lstm, x_seq, gclip=5.0, tile_b=None,
                        interpret=None):
    """Teacher-forced SentiCap chain from zero state -> h_seq (B, T, H).

    ``w_lstm``: (E+H, 4H) fused weight (no bias — ``mrnn.py:416``).
    ``x_seq``: (B, T, E) step inputs with the visual pseudo-word and any
    input dropout already applied.  Matches scanning
    :func:`icee_tpu.senticap.model.cell` (incl. GradClip-on-h semantics).
    """
    h_seq, _ = _fwd_impl(w_lstm, x_seq, gclip, tile_b, interpret)
    return h_seq


def _fwd_impl(w_lstm, x_seq, gclip, tile_b, interpret):
    interpret = _resolve_interpret(interpret)
    b, seq_len, e_dim = x_seq.shape
    h_dim = (w_lstm.shape[0] - e_dim)
    if tile_b is None:
        tile_b = _auto_tile(b)
    if b % tile_b != 0:
        raise ValueError(f"batch {b} not divisible by tile_b {tile_b}")
    n_bt = b // tile_b
    vmem = pltpu.VMEM

    x_t = jnp.swapaxes(x_seq, 0, 1)                        # (T, B, E)
    step = lambda w: pl.BlockSpec((1, tile_b, w),  # noqa: E731
                                  lambda bt, t: (t, bt, 0),
                                  memory_space=vmem)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bt, t: tuple([0] * len(shape)), memory_space=vmem)

    kernel = functools.partial(_fwd_kernel, h_dim=h_dim)
    h_t, c_t = pl.pallas_call(
        kernel,
        grid=(n_bt, seq_len),
        in_specs=[step(e_dim), full(*w_lstm.shape)],
        out_specs=(step(h_dim), step(h_dim)),
        out_shape=(
            jax.ShapeDtypeStruct((seq_len, b, h_dim), x_seq.dtype),
            jax.ShapeDtypeStruct((seq_len, b, h_dim), x_seq.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, h_dim), jnp.float32),
            pltpu.VMEM((tile_b, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_t, w_lstm)
    return jnp.swapaxes(h_t, 0, 1), (h_t, c_t)


def _vjp_fwd(w_lstm, x_seq, gclip, tile_b, interpret):
    h_seq, (h_t, c_t) = _fwd_impl(w_lstm, x_seq, gclip, tile_b, interpret)
    return h_seq, (w_lstm, x_seq, h_t, c_t)


def _vjp_bwd(gclip, tile_b, interpret, residuals, dh_seq):
    interpret = _resolve_interpret(interpret)
    w_lstm, x_seq, h_t, c_t = residuals
    b, seq_len, e_dim = x_seq.shape
    h_dim = w_lstm.shape[0] - e_dim
    if tile_b is None:
        tile_b = _auto_tile(b)
    n_bt = b // tile_b
    vmem = pltpu.VMEM

    x_t = jnp.swapaxes(x_seq, 0, 1)
    dh_t = jnp.swapaxes(dh_seq, 0, 1)

    rev = lambda bt, t: (seq_len - 1 - t, bt, 0)           # noqa: E731

    def rev_prev(bt, t):  # previous timestep's block, clamped at 0
        i = seq_len - 1 - t
        return (jnp.maximum(i - 1, 0), bt, 0)

    step = lambda w, idx: pl.BlockSpec((1, tile_b, w), idx,  # noqa: E731
                                       memory_space=vmem)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bt, t: tuple([0] * len(shape)), memory_space=vmem)

    kernel = functools.partial(_bwd_kernel, h_dim=h_dim, seq_len=seq_len,
                               gclip=float(gclip))
    dx_t, dw = pl.pallas_call(
        kernel,
        grid=(n_bt, seq_len),
        in_specs=[
            step(e_dim, rev),        # x_s
            step(h_dim, rev_prev),   # h_{s-1}
            step(h_dim, rev_prev),   # c_{s-1}
            step(h_dim, rev),        # c_s
            step(h_dim, rev),        # dh_s
            full(*w_lstm.shape),
        ],
        out_specs=(step(e_dim, rev), full(*w_lstm.shape)),
        out_shape=(
            jax.ShapeDtypeStruct((seq_len, b, e_dim), jnp.float32),
            jax.ShapeDtypeStruct(w_lstm.shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, h_dim), jnp.float32),
            pltpu.VMEM((tile_b, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_t, h_t, c_t, c_t, dh_t, w_lstm)
    dx_seq = jnp.swapaxes(dx_t, 0, 1).astype(x_seq.dtype)
    return dw.astype(w_lstm.dtype), dx_seq


fused_senticap_scan.defvjp(_vjp_fwd, _vjp_bwd)


def reference_senticap_scan(w_lstm, x_seq, gclip=5.0):
    """XLA oracle: scan of :func:`icee_tpu.senticap.model.cell` from zero
    state (GradClip custom op included)."""
    from icee_tpu.senticap.model import cell

    b, seq_len, _ = x_seq.shape
    h_dim = w_lstm.shape[0] - x_seq.shape[2]
    params = {"w_lstm": w_lstm}

    def body(carry, x_t):
        h, c = carry
        h, c = cell(params, x_t, h, c, gclip)
        return (h, c), h

    z = jnp.zeros((b, h_dim), x_seq.dtype)
    _, h_t = jax.lax.scan(body, (z, z), jnp.swapaxes(x_seq, 0, 1))
    return jnp.swapaxes(h_t, 0, 1)
