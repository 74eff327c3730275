"""Pallas TPU kernel: fused teacher-forced NIC (standard LSTM) training scan.

The NIC decoder (``nic/model.py:30-207``, SURVEY.md M6) steps a stock torch
``nn.LSTMCell`` — rebuilt as :func:`icee_tpu.ops.cells.lstm_cell` — over the
caption.  The XLA ``lax.scan`` re-reads W_ih (E, 4H) + W_hh (H, 4H) from HBM
every timestep in BOTH directions and round-trips the dW accumulators per
step; at the reference regime (E=300, H=512) that is ~6.7 MB of pure weight
traffic per step per direction.  Same structure as the SentiCap whole-scan
kernel (``ops/pallas_senticap_train.py``, measured 1.27x on hardware), with
torch cell semantics instead:

- gate order ``[i, f, g, o]`` along the 4H axis (torch chunk order);
- ``c = f*c + i*tanh(g)``, ``h = o * tanh(c)`` (real tanh, unlike the
  reference StyleNet/SentiCap ``h = o*c`` quirk);
- biases: ``z = x@W_ih + b_ih + h@W_hh + b_hh`` with the exact same f32
  accumulation order as the XLA cell (two separate dots, no in-kernel
  concat) so interpret-mode parity is exact;
- no GradClip on the recurrent path (the reference NIC clamps PARAMETER
  grads after backward, ``nic/utils.py`` clip_gradient — that stays outside).

``_fwd_kernel``: grid ``(B/tile_b, T)``; both weight matrices VMEM-resident
across the whole scan, (h, c) carried in f32 scratch, emits h and c
sequences (the backward's residuals).

``_bwd_kernel``: reversed time index maps; recomputes the gates from the
saved (x, h_prev, c_prev), chains (dh, dc) through scratch, accumulates
dW_ih/dW_hh/db in VMEM.  ``b_ih`` and ``b_hh`` receive the same cotangent.

Exact-f32 parity with ``jax.grad`` of the XLA scan is tested in interpret
mode (``tests/test_pallas_nic_train.py``).
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


def _gates(x, h_prev, wih_ref, whh_ref, bih_ref, bhh_ref, h_dim):
    """z with the XLA cell's exact f32 add order (``ops/cells.py:79``):
    (((x @ W_ih) + b_ih) + (h @ W_hh)) + b_hh, torch gate order [i,f,g,o]."""
    z = jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32)
    z = z + bih_ref[0]
    z = z + jnp.dot(h_prev, whh_ref[:], preferred_element_type=jnp.float32)
    z = z + bhh_ref[0]
    i_t = jax.nn.sigmoid(z[:, :h_dim])
    f_t = jax.nn.sigmoid(z[:, h_dim:2 * h_dim])
    g_t = jnp.tanh(z[:, 2 * h_dim:3 * h_dim])
    o_t = jax.nn.sigmoid(z[:, 3 * h_dim:])
    return i_t, f_t, g_t, o_t


def _fwd_kernel(x_ref, wih_ref, whh_ref, bih_ref, bhh_ref,
                h_out_ref, c_out_ref, h_scr, c_scr, *, h_dim: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    x = x_ref[0].astype(jnp.float32)
    i_t, f_t, g_t, o_t = _gates(
        x, h_scr[:], wih_ref, whh_ref, bih_ref, bhh_ref, h_dim)
    c_new = f_t * c_scr[:] + i_t * g_t
    h_new = o_t * jnp.tanh(c_new)
    h_out_ref[0] = h_new.astype(h_out_ref.dtype)
    c_out_ref[0] = c_new.astype(c_out_ref.dtype)
    h_scr[:] = h_out_ref[0].astype(jnp.float32)
    c_scr[:] = c_out_ref[0].astype(jnp.float32)


def _bwd_kernel(x_ref, hp_ref, cp_ref, c_ref, dh_ref,
                wih_ref, whh_ref, bih_ref, bhh_ref,
                dx_ref, dwih_ref, dwhh_ref, db_ref, dh_scr, dc_scr,
                *, h_dim: int, seq_len: int):
    bt = pl.program_id(0)
    g_idx = pl.program_id(1)
    s = seq_len - 1 - g_idx

    @pl.when((bt == 0) & (g_idx == 0))
    def _init_acc():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

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

    i_t, f_t, g_t, o_t = _gates(
        x, h_prev, wih_ref, whh_ref, bih_ref, bhh_ref, h_dim)
    tanh_c = jnp.tanh(c_new)

    dh_total = dh_ref[0].astype(jnp.float32) + dh_scr[:]
    d_o = dh_total * tanh_c
    dc_new = dh_total * o_t * (1.0 - tanh_c * tanh_c) + dc_scr[:]
    d_i = dc_new * g_t
    d_f = dc_new * c_prev
    d_g = dc_new * i_t
    dc_scr[:] = dc_new * f_t

    dz = jnp.concatenate(
        [d_i * i_t * (1.0 - i_t),
         d_f * f_t * (1.0 - f_t),
         d_g * (1.0 - g_t * g_t),
         d_o * o_t * (1.0 - o_t)], axis=1)                 # (n, 4H)

    dwih_ref[:] += jnp.dot(x.T, dz, preferred_element_type=jnp.float32)
    dwhh_ref[:] += jnp.dot(h_prev.T, dz,
                           preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dx_ref[0] = jnp.dot(dz, wih_ref[:].T,
                        preferred_element_type=jnp.float32
                        ).astype(dx_ref.dtype)
    dh_scr[:] = jnp.dot(dz, whh_ref[:].T,
                        preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_nic_scan(cell, x_seq, tile_b=None, interpret=None):
    """Teacher-forced standard-LSTM chain from zero state -> h_seq (B, T, H).

    ``cell``: {"W_ih" (E, 4H), "W_hh" (H, 4H), "b_ih" (4H,), "b_hh" (4H,)}
    — the :func:`icee_tpu.models.lstm.init_cell_params` layout.
    ``x_seq``: (B, T, E) step inputs (feature at step 0, dropped-out teacher
    embeddings after; prepared by the model glue).  Matches scanning
    :func:`icee_tpu.ops.cells.lstm_cell` exactly in f32.
    """
    h_seq, _ = _fwd_impl(cell, x_seq, tile_b, interpret)
    return h_seq


def _fwd_impl(cell, x_seq, tile_b, interpret):
    interpret = _resolve_interpret(interpret)
    b, seq_len, e_dim = x_seq.shape
    h_dim = cell["W_hh"].shape[0]
    if tile_b is None:
        tile_b = _auto_tile(b)
    if b % tile_b != 0:
        raise ValueError(f"batch {b} not divisible by tile_b {tile_b}")
    n_bt = b // tile_b
    vmem = pltpu.VMEM

    x_t = jnp.swapaxes(x_seq, 0, 1)                        # (T, B, E)
    bih = cell["b_ih"].reshape(1, -1)
    bhh = cell["b_hh"].reshape(1, -1)
    step = lambda w: pl.BlockSpec((1, tile_b, w),  # noqa: E731
                                  lambda bt, t: (t, bt, 0),
                                  memory_space=vmem)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bt, t: tuple([0] * len(shape)), memory_space=vmem)

    kernel = functools.partial(_fwd_kernel, h_dim=h_dim)
    h_t, c_t = pl.pallas_call(
        kernel,
        grid=(n_bt, seq_len),
        in_specs=[step(e_dim), full(*cell["W_ih"].shape),
                  full(*cell["W_hh"].shape), full(1, 4 * h_dim),
                  full(1, 4 * h_dim)],
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
    )(x_t, cell["W_ih"], cell["W_hh"], bih, bhh)
    return jnp.swapaxes(h_t, 0, 1), (h_t, c_t)


def _vjp_fwd(cell, x_seq, tile_b, interpret):
    h_seq, (h_t, c_t) = _fwd_impl(cell, x_seq, tile_b, interpret)
    return h_seq, (cell, x_seq, h_t, c_t)


def _vjp_bwd(tile_b, interpret, residuals, dh_seq):
    interpret = _resolve_interpret(interpret)
    cell, x_seq, h_t, c_t = residuals
    b, seq_len, e_dim = x_seq.shape
    h_dim = cell["W_hh"].shape[0]
    if tile_b is None:
        tile_b = _auto_tile(b)
    n_bt = b // tile_b
    vmem = pltpu.VMEM

    x_t = jnp.swapaxes(x_seq, 0, 1)
    dh_t = jnp.swapaxes(dh_seq, 0, 1)
    bih = cell["b_ih"].reshape(1, -1)
    bhh = cell["b_hh"].reshape(1, -1)

    rev = lambda bt, t: (seq_len - 1 - t, bt, 0)           # noqa: E731

    def rev_prev(bt, t):  # previous timestep's block, clamped at 0
        i = seq_len - 1 - t
        return (jnp.maximum(i - 1, 0), bt, 0)

    step = lambda w, idx: pl.BlockSpec((1, tile_b, w), idx,  # noqa: E731
                                       memory_space=vmem)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bt, t: tuple([0] * len(shape)), memory_space=vmem)

    kernel = functools.partial(_bwd_kernel, h_dim=h_dim, seq_len=seq_len)
    dx_t, dwih, dwhh, db = pl.pallas_call(
        kernel,
        grid=(n_bt, seq_len),
        in_specs=[
            step(e_dim, rev),        # x_s
            step(h_dim, rev_prev),   # h_{s-1}
            step(h_dim, rev_prev),   # c_{s-1}
            step(h_dim, rev),        # c_s
            step(h_dim, rev),        # dh_s
            full(*cell["W_ih"].shape),
            full(*cell["W_hh"].shape),
            full(1, 4 * h_dim),
            full(1, 4 * h_dim),
        ],
        out_specs=(step(e_dim, rev), full(*cell["W_ih"].shape),
                   full(*cell["W_hh"].shape), full(1, 4 * h_dim)),
        out_shape=(
            jax.ShapeDtypeStruct((seq_len, b, e_dim), jnp.float32),
            jax.ShapeDtypeStruct(cell["W_ih"].shape, jnp.float32),
            jax.ShapeDtypeStruct(cell["W_hh"].shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * h_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_b, h_dim), jnp.float32),
            pltpu.VMEM((tile_b, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_t, h_t, c_t, c_t, dh_t, cell["W_ih"], cell["W_hh"], bih, bhh)
    dx_seq = jnp.swapaxes(dx_t, 0, 1).astype(x_seq.dtype)
    db_flat = db.reshape(-1)
    d_cell = {
        "W_ih": dwih.astype(cell["W_ih"].dtype),
        "W_hh": dwhh.astype(cell["W_hh"].dtype),
        "b_ih": db_flat.astype(cell["b_ih"].dtype),
        "b_hh": db_flat.astype(cell["b_hh"].dtype),
    }
    return d_cell, dx_seq


fused_nic_scan.defvjp(_vjp_fwd, _vjp_bwd)


def reference_nic_scan(cell, x_seq):
    """XLA oracle: scan of :func:`icee_tpu.ops.cells.lstm_cell` from zero
    state."""
    from icee_tpu.ops.cells import lstm_cell

    b = x_seq.shape[0]
    h_dim = cell["W_hh"].shape[0]

    def body(carry, x_t):
        h, c = carry
        h, c = lstm_cell(cell, x_t, h, c)
        return (h, c), h

    z = jnp.zeros((b, h_dim), x_seq.dtype)
    _, h_t = jax.lax.scan(body, (z, z), jnp.swapaxes(x_seq, 0, 1))
    return jnp.swapaxes(h_t, 0, 1)
