"""Import shims: reference torch ``state_dict`` checkpoints -> our pytrees.

The reference saves either raw ``state_dict`` files (``train.py:214-220``,
loaded by ``sample.py:46-47``) or whole-module pickles (``utils.py:63-90``,
whose tensors are the same state_dict entries).  These shims map the
per-gate/per-style ``nn.Linear`` tensors onto our stacked layout so trained
reference artifacts run in this framework for parity checks (SURVEY.md §5
"import shims for parity runs").

Layout recap (ops/cells.py): gate order [i, f, o, c]; style order
[factual, happy, sad, angry]; our linear weights are the transpose of
torch's ``(out, in)``.

Tensors may be torch tensors or numpy arrays (a host without torch can load
``.npz`` exports of the same names).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

GATES = ("i", "f", "o", "c")
STYLE_PREFIXES = ("f", "happy_", "sad_", "angry_")  # S_fi vs S_happy_i naming


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _linear_w(sd: Mapping, name: str) -> np.ndarray:
    """torch Linear weight (out, in) -> our (in, out)."""
    return _np(sd[f"{name}.weight"]).T


def _linear_b(sd: Mapping, name: str) -> np.ndarray:
    return _np(sd[f"{name}.bias"])


def import_factored_decoder_state_dict(sd: Mapping, dtype=jnp.float32) -> dict:
    """``DecoderFactoredLSTM`` state_dict (stylenet/model.py:52-94) -> params."""
    e = _np(sd["B.weight"]).shape[1]
    f = _np(sd["U_i.weight"]).shape[1]
    h = _np(sd["U_i.weight"]).shape[0]

    v_w = np.concatenate([_linear_w(sd, f"V_{g}") for g in GATES], axis=1)
    v_b = np.stack([_linear_b(sd, f"V_{g}") for g in GATES])
    s_w = np.stack([
        np.stack([_linear_w(sd, f"S_{sp}{g}") for g in GATES])
        for sp in STYLE_PREFIXES
    ])
    s_b = np.stack([
        np.stack([_linear_b(sd, f"S_{sp}{g}") for g in GATES])
        for sp in STYLE_PREFIXES
    ])
    u_w = np.stack([_linear_w(sd, f"U_{g}") for g in GATES])
    u_b = np.stack([_linear_b(sd, f"U_{g}") for g in GATES])
    w_w = np.concatenate([_linear_w(sd, f"W_{g}") for g in GATES], axis=1)
    w_b = np.stack([_linear_b(sd, f"W_{g}") for g in GATES])

    params = {
        "B": _np(sd["B.weight"]),
        "V_w": v_w, "V_b": v_b,
        "S_w": s_w, "S_b": s_b,
        "U_w": u_w, "U_b": u_b,
        "W_w": w_w, "W_b": w_b,
        "C_w": _linear_w(sd, "C"),
        "C_b": _linear_b(sd, "C"),
    }
    return {k: jnp.asarray(v, dtype) for k, v in params.items()}


def import_factored_att_decoder_state_dict(sd: Mapping, dtype=jnp.float32) -> dict:
    """``DecoderFactoredLSTMAtt`` state_dict (stylenet/model_att.py:93-164)."""
    params = import_factored_decoder_state_dict(sd, dtype)
    att_names = ("attention", "attention_happy", "attention_sad",
                 "attention_angry")
    att = {
        "enc_w": np.stack([_linear_w(sd, f"{a}.encoder_att") for a in att_names]),
        "enc_b": np.stack([_linear_b(sd, f"{a}.encoder_att") for a in att_names]),
        "dec_w": np.stack([_linear_w(sd, f"{a}.decoder_att") for a in att_names]),
        "dec_b": np.stack([_linear_b(sd, f"{a}.decoder_att") for a in att_names]),
        "full_w": np.stack([_linear_w(sd, f"{a}.full_att") for a in att_names]),
        "full_b": np.stack([_linear_b(sd, f"{a}.full_att") for a in att_names]),
    }
    params["attention"] = {k: jnp.asarray(v, dtype) for k, v in att.items()}
    for ours, theirs in (("init_h", "init_h"), ("init_c", "init_c"),
                         ("f_beta", "f_beta")):
        params[f"{ours}_w"] = jnp.asarray(_linear_w(sd, theirs), dtype)
        params[f"{ours}_b"] = jnp.asarray(_linear_b(sd, theirs), dtype)
    return params


def import_nic_att_decoder_state_dict(sd: Mapping, dtype=jnp.float32) -> dict:
    """``DecoderRNNAtt`` state_dict (nic/model_att.py:73-161): embedding +
    LSTMCell(E+2048 -> H) + output linear + single attention net + h/c init
    + gating projection."""
    params = import_nic_decoder_state_dict(sd, dtype)
    params["attention"] = {
        "enc_w": jnp.asarray(_linear_w(sd, "attention.encoder_att"), dtype),
        "enc_b": jnp.asarray(_linear_b(sd, "attention.encoder_att"), dtype),
        "dec_w": jnp.asarray(_linear_w(sd, "attention.decoder_att"), dtype),
        "dec_b": jnp.asarray(_linear_b(sd, "attention.decoder_att"), dtype),
        "full_w": jnp.asarray(_linear_w(sd, "attention.full_att"), dtype),
        "full_b": jnp.asarray(_linear_b(sd, "attention.full_att"), dtype),
    }
    for name in ("init_h", "init_c", "f_beta"):
        params[f"{name}_w"] = jnp.asarray(_linear_w(sd, name), dtype)
        params[f"{name}_b"] = jnp.asarray(_linear_b(sd, name), dtype)
    return params


def import_nic_decoder_state_dict(sd: Mapping, dtype=jnp.float32) -> dict:
    """``DecoderRNN`` state_dict (nic/model.py:48-53): embedding + LSTMCell +
    output linear.  torch LSTMCell weights are (4H, in) in [i,f,g,o] order —
    exactly our cell layout transposed."""
    return {
        "embed": jnp.asarray(_np(sd["embed.weight"]), dtype),
        "cell": {
            "W_ih": jnp.asarray(_np(sd["lstm.weight_ih"]).T, dtype),
            "W_hh": jnp.asarray(_np(sd["lstm.weight_hh"]).T, dtype),
            "b_ih": jnp.asarray(_np(sd["lstm.bias_ih"]), dtype),
            "b_hh": jnp.asarray(_np(sd["lstm.bias_hh"]), dtype),
        },
        "linear_w": jnp.asarray(_linear_w(sd, "linear"), dtype),
        "linear_b": jnp.asarray(_linear_b(sd, "linear"), dtype),
    }


def _seq2seq_half(sd: Mapping, prefix: str, dtype) -> dict:
    """One ``EncoderRNN``/``DecoderRNN`` half (``seq2seq/model.py:30-64,
    125-144``): embedding + ``nn.LSTM`` layer stack + output linear.
    ``nn.LSTM`` stores per-layer ``weight_ih_l{n}`` (4H, in) in torch's
    [i, f, g, o] gate order — our cell layout transposed."""
    layers = []
    n = 0
    while f"{prefix}.lstm.weight_ih_l{n}" in sd:
        layers.append({
            "W_ih": jnp.asarray(_np(sd[f"{prefix}.lstm.weight_ih_l{n}"]).T, dtype),
            "W_hh": jnp.asarray(_np(sd[f"{prefix}.lstm.weight_hh_l{n}"]).T, dtype),
            "b_ih": jnp.asarray(_np(sd[f"{prefix}.lstm.bias_ih_l{n}"]), dtype),
            "b_hh": jnp.asarray(_np(sd[f"{prefix}.lstm.bias_hh_l{n}"]), dtype),
        })
        n += 1
    if not layers:
        raise KeyError(f"no {prefix}.lstm.weight_ih_l0 in state_dict")
    return {
        "embed": jnp.asarray(_np(sd[f"{prefix}.embed.weight"]), dtype),
        "lstm": layers,
        "linear_w": jnp.asarray(_linear_w(sd, f"{prefix}.linear"), dtype),
        "linear_b": jnp.asarray(_linear_b(sd, f"{prefix}.linear"), dtype),
    }


def import_seq2seq_state_dict(sd: Mapping, dtype=jnp.float32) -> dict:
    """``Seq2Seq`` state_dict (``seq2seq/model.py:220-254``) -> our pytree:
    encoder half + the three per-emotion decoders stacked on axis 0 in
    (happy, sad, angry) order (``models/seq2seq.py`` emotion ids)."""
    import jax

    decoders = [_seq2seq_half(sd, f"decoder_{m}", dtype)
                for m in ("happy", "sad", "angry")]
    return {
        "encoder": _seq2seq_half(sd, "encoder", dtype),
        "decoders": jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *decoders),
    }


def import_encoder_head_state_dict(sd: Mapping, dtype=jnp.float32) -> dict:
    """``EncoderCNN`` head (linear + bn) state_dict (stylenet/model.py:19-20).
    The ResNet trunk goes through
    :func:`icee_tpu.models.resnet.import_torch_state_dict` with the
    ``resnet.`` prefix stripped."""
    return {
        "linear_w": jnp.asarray(_linear_w(sd, "linear"), dtype),
        "linear_b": jnp.asarray(_linear_b(sd, "linear"), dtype),
        "bn": {
            "weight": jnp.asarray(_np(sd["bn.weight"]), dtype),
            "bias": jnp.asarray(_np(sd["bn.bias"]), dtype),
            "running_mean": jnp.asarray(_np(sd["bn.running_mean"]), dtype),
            "running_var": jnp.asarray(_np(sd["bn.running_var"]), dtype),
        },
    }
