"""Pallas TPU kernels: fused teacher-forced FactoredLSTM training scan.

The training hot loop (``stylenet/model.py:157-196``; rebuilt as the
``lax.scan`` fast path in ``models/factored_lstm.py:forward``) runs T
recurrent cell steps.  In XLA each scan iteration re-reads every weight from
HBM (~14 MB/step at the flagship config) and launches small (B=64) matmuls —
latency- and bandwidth-bound, not compute-bound.

These kernels keep ALL cell weights VMEM-resident across the whole time
scan, in both directions:

- ``_fwd_kernel``: grid ``(T,)``; carries (h, c) in f32 VMEM scratch,
  streams one timestep's input block per grid step, writes the full hidden
  and cell-state sequences (the residuals the backward pass needs),
- ``_bwd_kernel``: grid ``(T,)`` with REVERSED index maps; recomputes the
  gate activations from the saved (x, h_prev, c_prev) (rematerialisation:
  trades MXU flops for HBM traffic), chains (dh, dc) through VMEM scratch,
  and accumulates all weight gradients in VMEM, emitting them once at the
  final grid step.

``fused_factored_scan`` wraps both in a ``jax.custom_vjp`` so
``jax.value_and_grad`` of a loss over the scan uses the fused backward.
Style slicing (``jnp.take`` on the stacked S tensors) happens OUTSIDE the
custom_vjp, so the gradient scatter back into the (num_styles, ...) stack is
handled by XLA autodiff.

Numerics match :func:`icee_tpu.ops.cells.factored_lstm_cell` (f32
accumulation, ``h = o * c`` quirk, carry rounded through the input dtype);
gradients are tested in interpret mode against ``jax.grad`` of the XLA scan
(``tests/test_pallas_lstm.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icee_tpu.ops.kernel_common import resolve_interpret as _resolve_interpret


def _gates(x, h_prev, vw, vb, sw, sb, uw, ub, ww, wb, f_dim, h_dim, wdt):
    """Recompute pre-activations and gate values for one step (f32)."""
    v_all = jnp.dot(x, vw, preferred_element_type=jnp.float32)
    w_all = jnp.dot(h_prev, ww, preferred_element_type=jnp.float32)
    vs, ss, zs = [], [], []
    for g in range(4):
        v_g = v_all[:, g * f_dim:(g + 1) * f_dim] + vb[g, :]
        s_g = jnp.dot(v_g.astype(wdt), sw[g],
                      preferred_element_type=jnp.float32) + sb[g, :]
        u_g = jnp.dot(s_g.astype(wdt), uw[g],
                      preferred_element_type=jnp.float32) + ub[g, :]
        vs.append(v_g)
        ss.append(s_g)
        zs.append(u_g + w_all[:, g * h_dim:(g + 1) * h_dim] + wb[g, :])
    i_t = jax.nn.sigmoid(zs[0])
    f_t = jax.nn.sigmoid(zs[1])
    o_t = jax.nn.sigmoid(zs[2])
    g_t = jnp.tanh(zs[3])
    return vs, ss, (i_t, f_t, o_t, g_t)


def _fwd_kernel(x_ref, vw_ref, vb_ref, sw_ref, sb_ref, uw_ref, ub_ref,
                ww_ref, wb_ref, h_out_ref, c_out_ref, h_scr, c_scr,
                *, f_dim: int, h_dim: int):
    t = pl.program_id(0)
    wdt = vw_ref.dtype

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    x = x_ref[0].astype(wdt)
    _, _, (i_t, f_t, o_t, g_t) = _gates(
        x, h_scr[:].astype(wdt), vw_ref[:], vb_ref[:], sw_ref[:], sb_ref[:],
        uw_ref[:], ub_ref[:], ww_ref[:], wb_ref[:], f_dim, h_dim, wdt)
    c_new = f_t * c_scr[:] + i_t * g_t
    h_new = o_t * c_new                      # reference quirk: no tanh
    # round the carry through the I/O dtype exactly like the XLA scan
    # (factored_lstm_cell returns h.astype(h.dtype))
    h_out_ref[0] = h_new.astype(h_out_ref.dtype)
    c_out_ref[0] = c_new.astype(c_out_ref.dtype)
    h_scr[:] = h_out_ref[0].astype(jnp.float32)
    c_scr[:] = c_out_ref[0].astype(jnp.float32)


def _bwd_kernel(x_ref, xp_ref, hp_ref, cp_ref, c_ref, dh_ref, dc_ref,
                vw_ref, vb_ref, sw_ref, sb_ref, uw_ref, ub_ref,
                ww_ref, wb_ref,
                dx_ref, dvw_ref, dvb_ref, dsw_ref, dsb_ref, duw_ref,
                dub_ref, dww_ref, dwb_ref,
                dh_scr, dc_scr,
                *, f_dim: int, h_dim: int, seq_len: int):
    """Reverse-time step: grid index g processes timestep s = T-1-g.

    ``xp/hp/cp`` are the PREVIOUS step's (x is unused there — only h, c)
    blocks, index-clamped to 0 at s=0 and masked in-kernel.
    """
    g_idx = pl.program_id(0)
    s = seq_len - 1 - g_idx
    wdt = vw_ref.dtype
    del xp_ref  # clamped neighbor x is not needed; kept for spec symmetry

    @pl.when(g_idx == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dvw_ref[:] = jnp.zeros_like(dvw_ref)
        dvb_ref[:] = jnp.zeros_like(dvb_ref)
        dsw_ref[:] = jnp.zeros_like(dsw_ref)
        dsb_ref[:] = jnp.zeros_like(dsb_ref)
        duw_ref[:] = jnp.zeros_like(duw_ref)
        dub_ref[:] = jnp.zeros_like(dub_ref)
        dww_ref[:] = jnp.zeros_like(dww_ref)
        dwb_ref[:] = jnp.zeros_like(dwb_ref)

    first_step = s == 0
    zero_f = jnp.float32(0.0)
    h_prev = jnp.where(first_step, zero_f, hp_ref[0].astype(jnp.float32))
    c_prev = jnp.where(first_step, zero_f, cp_ref[0].astype(jnp.float32))
    x = x_ref[0].astype(wdt)
    c_new = c_ref[0].astype(jnp.float32)

    vs, ss, (i_t, f_t, o_t, g_t) = _gates(
        x, h_prev.astype(wdt), vw_ref[:], vb_ref[:], sw_ref[:], sb_ref[:],
        uw_ref[:], ub_ref[:], ww_ref[:], wb_ref[:], f_dim, h_dim, wdt)

    dh_total = dh_ref[0].astype(jnp.float32) + dh_scr[:]
    dc_in = dc_ref[0].astype(jnp.float32) + dc_scr[:]
    d_o = dh_total * c_new
    dc_new = dh_total * o_t + dc_in
    d_f = dc_new * c_prev
    d_i = dc_new * g_t
    d_g = dc_new * i_t
    dc_scr[:] = dc_new * f_t

    dz = [d_i * i_t * (1.0 - i_t),
          d_f * f_t * (1.0 - f_t),
          d_o * o_t * (1.0 - o_t),
          d_g * (1.0 - g_t * g_t)]

    dh_prev = jnp.zeros_like(dh_total)
    dx = jnp.zeros((x.shape[0], x.shape[1]), jnp.float32)
    hp_w = h_prev.astype(wdt)
    for g in range(4):
        dz_g = dz[g]
        dz_b = dz_g.astype(wdt)
        # U branch: u = s @ U[g]
        duw_ref[g] += jnp.dot(ss[g].astype(wdt).T, dz_b,
                              preferred_element_type=jnp.float32)
        dub_ref[g, :] += jnp.sum(dz_g, axis=0)
        ds = jnp.dot(dz_b, uw_ref[g].T, preferred_element_type=jnp.float32)
        ds_b = ds.astype(wdt)
        # S branch: s = v @ S[g]
        dsw_ref[g] += jnp.dot(vs[g].astype(wdt).T, ds_b,
                              preferred_element_type=jnp.float32)
        dsb_ref[g, :] += jnp.sum(ds, axis=0)
        dv = jnp.dot(ds_b, sw_ref[g].T, preferred_element_type=jnp.float32)
        dv_b = dv.astype(wdt)
        # V branch: v = x @ V[:, gF:(g+1)F]
        dvw_ref[:, g * f_dim:(g + 1) * f_dim] += jnp.dot(
            x.T, dv_b, preferred_element_type=jnp.float32)
        dvb_ref[g, :] += jnp.sum(dv, axis=0)
        dx += jnp.dot(dv_b, vw_ref[:, g * f_dim:(g + 1) * f_dim].T,
                      preferred_element_type=jnp.float32)
        # W branch: w = h_prev @ W[:, gH:(g+1)H]
        dww_ref[:, g * h_dim:(g + 1) * h_dim] += jnp.dot(
            hp_w.T, dz_b, preferred_element_type=jnp.float32)
        dwb_ref[g, :] += jnp.sum(dz_g, axis=0)
        dh_prev += jnp.dot(dz_b, ww_ref[:, g * h_dim:(g + 1) * h_dim].T,
                           preferred_element_type=jnp.float32)

    dh_scr[:] = dh_prev
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _specs_fwd(seq_len, b, e_dim, f_dim, h_dim):
    vmem = pltpu.VMEM
    step = lambda w: pl.BlockSpec((1, b, w), lambda t: (t, 0, 0),  # noqa: E731
                                  memory_space=vmem)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: tuple([0] * len(shape)), memory_space=vmem)
    in_specs = [
        step(e_dim),                     # x_seq (T, B, E)
        full(e_dim, 4 * f_dim),          # V_w
        full(4, f_dim),                  # V_b
        full(4, f_dim, f_dim),           # S_w (style slice)
        full(4, f_dim),                  # S_b
        full(4, f_dim, h_dim),           # U_w
        full(4, h_dim),                  # U_b
        full(h_dim, 4 * h_dim),          # W_w
        full(4, h_dim),                  # W_b
    ]
    out_specs = (step(h_dim), step(h_dim))
    return in_specs, out_specs



@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_factored_scan(params, x_seq, interpret=None):
    """Teacher-forced FactoredLSTM chain -> (h_seq, c_seq), each (B, T, H).

    ``params``: dict with V/S/U/W weights where S is already the selected
    style slice ``(4, F, F)``.  ``x_seq``: (B, T, E) step inputs (feature-
    prepended embeddings).  Matches scanning
    :func:`icee_tpu.ops.cells.factored_lstm_cell` from zero state.
    """
    h_seq, _ = _scan_fwd_impl(params, x_seq, interpret)
    return h_seq


def _scan_fwd_impl(params, x_seq, interpret):
    interpret = _resolve_interpret(interpret)
    b, seq_len, e_dim = x_seq.shape
    f_dim = params["U_w"].shape[1]
    h_dim = params["W_w"].shape[0]
    x_t = jnp.swapaxes(x_seq, 0, 1)              # (T, B, E)
    in_specs, out_specs = _specs_fwd(seq_len, b, e_dim, f_dim, h_dim)
    kernel = functools.partial(_fwd_kernel, f_dim=f_dim, h_dim=h_dim)
    h_t, c_t = pl.pallas_call(
        kernel,
        grid=(seq_len,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((seq_len, b, h_dim), x_seq.dtype),
            jax.ShapeDtypeStruct((seq_len, b, h_dim), x_seq.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32),
            pltpu.VMEM((b, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_t, params["V_w"], params["V_b"], params["S_w"], params["S_b"],
      params["U_w"], params["U_b"], params["W_w"], params["W_b"])
    return jnp.swapaxes(h_t, 0, 1), jnp.swapaxes(c_t, 0, 1)


def _scan_fwd(params, x_seq, interpret):
    h_seq, c_seq = _scan_fwd_impl(params, x_seq, interpret)
    return h_seq, (params, x_seq, h_seq, c_seq)


def _scan_bwd(interpret, residuals, dh_seq):
    interpret = _resolve_interpret(interpret)
    params, x_seq, h_seq, c_seq = residuals
    b, seq_len, e_dim = x_seq.shape
    f_dim = params["U_w"].shape[1]
    h_dim = params["W_w"].shape[0]
    wdt = params["V_w"].dtype
    vmem = pltpu.VMEM

    x_t = jnp.swapaxes(x_seq, 0, 1)
    h_t = jnp.swapaxes(h_seq, 0, 1)
    c_t = jnp.swapaxes(c_seq, 0, 1)
    dh_t = jnp.swapaxes(dh_seq, 0, 1)
    dc_t = jnp.zeros_like(dh_t)  # no direct cotangent on c_seq (not emitted)

    rev = lambda t: (seq_len - 1 - t, 0, 0)            # noqa: E731

    def rev_prev(t):  # previous timestep's block, clamped at 0
        i = seq_len - 1 - t
        return (jnp.maximum(i - 1, 0), 0, 0)

    step = lambda w, idx: pl.BlockSpec((1, b, w), idx,  # noqa: E731
                                       memory_space=vmem)
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: tuple([0] * len(shape)), memory_space=vmem)

    in_specs = [
        step(e_dim, rev),        # x_s
        step(e_dim, rev_prev),   # x_{s-1} (unused, symmetry)
        step(h_dim, rev_prev),   # h_{s-1}
        step(h_dim, rev_prev),   # c_{s-1}
        step(h_dim, rev),        # c_s
        step(h_dim, rev),        # dh_s
        step(h_dim, rev),        # dc_s (zeros)
        full(e_dim, 4 * f_dim), full(4, f_dim),
        full(4, f_dim, f_dim), full(4, f_dim),
        full(4, f_dim, h_dim), full(4, h_dim),
        full(h_dim, 4 * h_dim), full(4, h_dim),
    ]
    out_specs = (
        step(e_dim, rev),                                  # dx_s
        full(e_dim, 4 * f_dim), full(4, f_dim),            # dV
        full(4, f_dim, f_dim), full(4, f_dim),             # dS
        full(4, f_dim, h_dim), full(4, h_dim),             # dU
        full(h_dim, 4 * h_dim), full(4, h_dim),            # dW
    )
    kernel = functools.partial(_bwd_kernel, f_dim=f_dim, h_dim=h_dim,
                               seq_len=seq_len)
    outs = pl.pallas_call(
        kernel,
        grid=(seq_len,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((seq_len, b, e_dim), jnp.float32),
            jax.ShapeDtypeStruct((e_dim, 4 * f_dim), jnp.float32),
            jax.ShapeDtypeStruct((4, f_dim), jnp.float32),
            jax.ShapeDtypeStruct((4, f_dim, f_dim), jnp.float32),
            jax.ShapeDtypeStruct((4, f_dim), jnp.float32),
            jax.ShapeDtypeStruct((4, f_dim, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((4, h_dim), jnp.float32),
            jax.ShapeDtypeStruct((h_dim, 4 * h_dim), jnp.float32),
            jax.ShapeDtypeStruct((4, h_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, h_dim), jnp.float32),
            pltpu.VMEM((b, h_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_t, x_t, h_t, c_t, c_t, dh_t, dc_t,
      params["V_w"], params["V_b"], params["S_w"], params["S_b"],
      params["U_w"], params["U_b"], params["W_w"], params["W_b"])
    (dx_t, dvw, dvb, dsw, dsb, duw, dub, dww, dwb) = outs
    dparams = {
        "V_w": dvw.astype(params["V_w"].dtype),
        "V_b": dvb.astype(params["V_b"].dtype),
        "S_w": dsw.astype(params["S_w"].dtype),
        "S_b": dsb.astype(params["S_b"].dtype),
        "U_w": duw.astype(params["U_w"].dtype),
        "U_b": dub.astype(params["U_b"].dtype),
        "W_w": dww.astype(params["W_w"].dtype),
        "W_b": dwb.astype(params["W_b"].dtype),
    }
    dx_seq = jnp.swapaxes(dx_t, 0, 1).astype(x_seq.dtype)
    return dparams, dx_seq


fused_factored_scan.defvjp(_scan_fwd, _scan_bwd)


def reference_scan(params, x_seq, style=None):
    """XLA oracle: scan of ``factored_lstm_cell`` from zero state (the
    ``forward`` teacher-forced fast path without head/embedding)."""
    from icee_tpu.ops.cells import factored_lstm_cell

    b, seq_len, _ = x_seq.shape
    h_dim = params["W_w"].shape[0]
    full = dict(params)
    if style is None:
        # params carry a pre-sliced S: rebuild a 1-style stack for the cell
        full["S_w"] = params["S_w"][None]
        full["S_b"] = params["S_b"][None]
        style = 0

    def body(carry, x_t):
        h, c = carry
        h, c = factored_lstm_cell(full, x_t, h, c, jnp.asarray(style))
        return (h, c), h

    z = jnp.zeros((b, h_dim), x_seq.dtype)
    _, h_t = jax.lax.scan(body, (z, z), jnp.swapaxes(x_seq, 0, 1))
    return jnp.swapaxes(h_t, 0, 1)
