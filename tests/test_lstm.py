"""Masked BiLSTM vs torch's packed-sequence LSTM (the reference text encoder
semantics, Multi_GCN_Multihead_att.py:366-398)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from mgnns_tpu.nn import lstm


def _copy_weights_to_torch(params, tl, num_layers, bidirectional):
    dirs = 2 if bidirectional else 1
    with torch.no_grad():
        for l in range(num_layers):
            for d in range(dirs):
                suffix = "_reverse" if d == 1 else ""
                p = params["layers"][l][d]
                getattr(tl, f"weight_ih_l{l}{suffix}").copy_(torch.from_numpy(np.asarray(p["w_ih"]).T))
                getattr(tl, f"weight_hh_l{l}{suffix}").copy_(torch.from_numpy(np.asarray(p["w_hh"]).T))
                getattr(tl, f"bias_ih_l{l}{suffix}").copy_(torch.from_numpy(np.asarray(p["b_ih"])))
                getattr(tl, f"bias_hh_l{l}{suffix}").copy_(torch.from_numpy(np.asarray(p["b_hh"])))


@pytest.mark.parametrize("num_layers,bidirectional", [(1, False), (1, True), (2, True)])
def test_lstm_matches_torch_packed(rng, num_layers, bidirectional):
    B, L, D, H = 5, 9, 6, 4
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lens = np.array([9, 7, 1, 4, 9])
    params = lstm.lstm_init(jax.random.key(0), D, H, num_layers, bidirectional)

    tl = torch.nn.LSTM(D, H, num_layers, bidirectional=bidirectional, batch_first=True)
    _copy_weights_to_torch(params, tl, num_layers, bidirectional)

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lens), batch_first=True, enforce_sorted=False
    )
    out_t, (h_t, c_t) = tl(packed)
    out_t, _ = torch.nn.utils.rnn.pad_packed_sequence(out_t, batch_first=True, total_length=L)

    out_j, (h_j, c_j) = lstm.lstm_apply(params, jnp.asarray(x), jnp.asarray(lens))

    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.detach().numpy(), atol=2e-5)


def test_lstm_final_state_concat_order(rng):
    """The model concatenates (state[-1], state[-2]) = (last-layer backward,
    last-layer forward) — verify those rows are where we expect."""
    B, L, D, H = 2, 5, 3, 4
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lens = np.array([5, 3])
    params = lstm.lstm_init(jax.random.key(1), D, H, 2, True)
    out, (h, c) = lstm.lstm_apply(params, jnp.asarray(x), jnp.asarray(lens))
    assert h.shape == (4, B, H)
    # forward final state of last layer = output at t = len-1, first H dims
    for b, ln in enumerate(lens):
        np.testing.assert_allclose(np.asarray(h[2, b]), np.asarray(out[b, ln - 1, :H]), atol=1e-6)
        # backward final state = output at t = 0, last H dims
        np.testing.assert_allclose(np.asarray(h[3, b]), np.asarray(out[b, 0, H:]), atol=1e-6)


def test_lstm_padded_outputs_zero(rng):
    B, L, D, H = 3, 6, 4, 5
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lens = np.array([6, 2, 4])
    params = lstm.lstm_init(jax.random.key(2), D, H, 2, True)
    out, _ = lstm.lstm_apply(params, jnp.asarray(x), jnp.asarray(lens))
    for b, ln in enumerate(lens):
        np.testing.assert_array_equal(np.asarray(out[b, ln:]), 0.0)
