"""Cell math parity: FactoredLSTM vs a NumPy oracle of the reference
equations (including the ``h = o*c`` no-tanh quirk), standard LSTM vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icee_tpu.ops.cells import factored_lstm_cell, lstm_cell, multilayer_lstm_cell


def _rand_factored_params(rng, e_in=12, f=16, h=20, ns=4):
    p = {
        "V_w": rng.standard_normal((e_in, 4 * f)).astype(np.float32) * 0.1,
        "V_b": rng.standard_normal((4, f)).astype(np.float32) * 0.1,
        "S_w": rng.standard_normal((ns, 4, f, f)).astype(np.float32) * 0.1,
        "S_b": rng.standard_normal((ns, 4, f)).astype(np.float32) * 0.1,
        "U_w": rng.standard_normal((4, f, h)).astype(np.float32) * 0.1,
        "U_b": rng.standard_normal((4, h)).astype(np.float32) * 0.1,
        "W_w": rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.1,
        "W_b": rng.standard_normal((4, h)).astype(np.float32) * 0.1,
    }
    return p


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def oracle_factored_step(p, x, h, c, style):
    """Direct transcription of stylenet/model.py:115-155 with unstacked
    per-gate weights recovered from the stacked layout."""
    e_in, f = p["V_w"].shape[0], p["U_w"].shape[1]
    hd = h.shape[-1]
    outs = {}
    for g in range(4):  # gate order [i, f, o, c]
        V = p["V_w"].reshape(e_in, 4, f)[:, g, :]
        vb = p["V_b"][g]
        S = p["S_w"][style, g]
        sb = p["S_b"][style, g]
        U = p["U_w"][g]
        ub = p["U_b"][g]
        W = p["W_w"].reshape(hd, 4, hd)[:, g, :]
        wb = p["W_b"][g]
        pre = ((x @ V + vb) @ S + sb) @ U + ub + h @ W + wb
        outs[g] = pre
    i_t = _sigmoid(outs[0])
    f_t = _sigmoid(outs[1])
    o_t = _sigmoid(outs[2])
    g_t = np.tanh(outs[3])
    c_new = f_t * c + i_t * g_t
    h_new = o_t * c_new  # reference quirk: NO tanh (model.py:153)
    return h_new, c_new


@pytest.mark.parametrize("style", [0, 1, 2, 3])
def test_factored_cell_matches_oracle(rng, style):
    p = _rand_factored_params(rng)
    x = rng.standard_normal((5, 12)).astype(np.float32)
    h = rng.standard_normal((5, 20)).astype(np.float32)
    c = rng.standard_normal((5, 20)).astype(np.float32)
    h_j, c_j = factored_lstm_cell(
        {k: jnp.asarray(v) for k, v in p.items()},
        jnp.asarray(x), jnp.asarray(h), jnp.asarray(c), jnp.asarray(style),
    )
    h_o, c_o = oracle_factored_step(p, x, h, c, style)
    np.testing.assert_allclose(np.asarray(h_j), h_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_o, rtol=1e-5, atol=1e-5)


def test_factored_cell_styles_differ(rng):
    p = {k: jnp.asarray(v) for k, v in _rand_factored_params(rng).items()}
    x = jnp.asarray(rng.standard_normal((3, 12)).astype(np.float32))
    h = jnp.zeros((3, 20))
    c = jnp.zeros((3, 20))
    h0, _ = factored_lstm_cell(p, x, h, c, jnp.asarray(0))
    h1, _ = factored_lstm_cell(p, x, h, c, jnp.asarray(1))
    assert not np.allclose(np.asarray(h0), np.asarray(h1))


def test_lstm_cell_matches_torch(rng):
    import torch

    e, hd, b = 10, 14, 4
    cell = torch.nn.LSTMCell(e, hd)
    params = {
        "W_ih": jnp.asarray(cell.weight_ih.detach().numpy().T),
        "W_hh": jnp.asarray(cell.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }
    x = rng.standard_normal((b, e)).astype(np.float32)
    h = rng.standard_normal((b, hd)).astype(np.float32)
    c = rng.standard_normal((b, hd)).astype(np.float32)
    with torch.no_grad():
        h_t, c_t = cell(torch.tensor(x), (torch.tensor(h), torch.tensor(c)))
    h_j, c_j = lstm_cell(params, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), rtol=1e-5, atol=1e-6)


def test_multilayer_lstm_matches_torch(rng):
    import torch

    e, hd, b, nl = 8, 12, 3, 2
    lstm = torch.nn.LSTM(e, hd, nl, batch_first=True)
    layers = []
    for i in range(nl):
        layers.append({
            "W_ih": jnp.asarray(getattr(lstm, f"weight_ih_l{i}").detach().numpy().T),
            "W_hh": jnp.asarray(getattr(lstm, f"weight_hh_l{i}").detach().numpy().T),
            "b_ih": jnp.asarray(getattr(lstm, f"bias_ih_l{i}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(lstm, f"bias_hh_l{i}").detach().numpy()),
        })
    x = rng.standard_normal((b, e)).astype(np.float32)
    h = rng.standard_normal((nl, b, hd)).astype(np.float32)
    c = rng.standard_normal((nl, b, hd)).astype(np.float32)
    with torch.no_grad():
        out_t, (h_t, c_t) = lstm(
            torch.tensor(x).unsqueeze(1), (torch.tensor(h), torch.tensor(c))
        )
    top, h_j, c_j = multilayer_lstm_cell(
        layers, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c)
    )
    np.testing.assert_allclose(np.asarray(top), out_t.squeeze(1).numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), rtol=1e-5, atol=1e-6)
