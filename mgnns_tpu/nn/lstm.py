"""Masked multi-layer bidirectional LSTM via ``lax.scan``.

TPU-native replacement for the reference's cuDNN
``pack_padded_sequence -> nn.LSTM -> pad_packed_sequence`` text encoder
(reference ``models/Multi_GCN_Multihead_att.py:366-398``):

- variable-length semantics are reproduced with masking: at padded steps the
  carry is held and the output is zero, which is exactly what pad_packed
  produces;
- the backward direction scans from the end of the *padded* buffer but only
  starts updating at the last valid token, which equals running on the
  reversed de-padded sequence — so its final state matches torch's;
- gate order (i, f, g, o) and the U(+-1/sqrt(H)) init match ``nn.LSTM`` so
  torch checkpoints can be imported weight-for-weight.

Shapes follow batch-first convention: inputs [B, L, D], outputs [B, L, 2H].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mgnns_tpu.nn.core import RngStream, dropout


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def lstm_init(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int = 2,
    bidirectional: bool = True,
    dtype=jnp.float32,
) -> dict:
    """Parameter pytree: ``layers[l][dir]`` with W_ih [D_l, 4H], W_hh [H, 4H],
    b_ih, b_hh [4H] (stored input-major so applies are plain matmuls)."""
    dirs = 2 if bidirectional else 1
    bound = 1.0 / np.sqrt(hidden_size)
    layers = []
    for l in range(num_layers):
        d_in = input_size if l == 0 else hidden_size * dirs
        dir_params = []
        for _ in range(dirs):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            dir_params.append(
                {
                    "w_ih": _uniform(k1, (d_in, 4 * hidden_size), bound, dtype),
                    "w_hh": _uniform(k2, (hidden_size, 4 * hidden_size), bound, dtype),
                    "b_ih": _uniform(k3, (4 * hidden_size,), bound, dtype),
                    "b_hh": _uniform(k4, (4 * hidden_size,), bound, dtype),
                }
            )
        layers.append(dir_params)
    return {"layers": layers}


def _cell_step(p: dict, xw_t: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, H: int):
    """One LSTM cell step given the *precomputed* input projection ``xw_t``
    (= x_t @ W_ih + b_ih).  Hoisting that projection out of the scan turns
    L small [B, D]x[D, 4H] matmuls into one [B*L, D]x[D, 4H] MXU matmul."""
    gates = xw_t + h @ p["w_hh"] + p["b_hh"]
    i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _scan_direction(p: dict, x: jnp.ndarray, lens: jnp.ndarray, reverse: bool):
    """One direction over [B, L, D].  Returns (outputs [B, L, H], h_T, c_T)."""
    B, L, _ = x.shape
    H = p["w_hh"].shape[0]
    xw = x @ p["w_ih"] + p["b_ih"]        # [B, L, 4H], single MXU matmul
    h0 = jnp.zeros((B, H), x.dtype)
    c0 = jnp.zeros((B, H), x.dtype)
    ts = jnp.arange(L)
    if reverse:
        ts = ts[::-1]

    def step(carry, t):
        h, c = carry
        h_new, c_new = _cell_step(p, xw[:, t, :], h, c, H)
        upd = (t < lens)[:, None]
        h = jnp.where(upd, h_new, h)
        c = jnp.where(upd, c_new, c)
        out_t = jnp.where(upd, h, 0.0)
        return (h, c), out_t

    (hT, cT), outs = jax.lax.scan(step, (h0, c0), ts)
    outs = jnp.swapaxes(outs, 0, 1)  # [B, L', H] in scan order
    if reverse:
        outs = outs[:, ::-1, :]
    return outs, hT, cT


def gru_init(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int = 2,
    bidirectional: bool = True,
    dtype=jnp.float32,
) -> dict:
    """``nn.GRU``-compatible parameters: ``layers[l][dir]`` with W_ih
    [D_l, 3H], W_hh [H, 3H], b_ih, b_hh [3H], gate order (r, z, n).

    The reference constructs (but never calls) this module as ``self.rnn``
    (Multi_GCN_Multihead_att.py:172-177), so its weights appear in every
    reference checkpoint; this init exists for state_dict-complete interop
    (import/export round trip) and as a usable encoder in its own right.
    """
    dirs = 2 if bidirectional else 1
    bound = 1.0 / np.sqrt(hidden_size)
    layers = []
    for l in range(num_layers):
        d_in = input_size if l == 0 else hidden_size * dirs
        dir_params = []
        for _ in range(dirs):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            dir_params.append(
                {
                    "w_ih": _uniform(k1, (d_in, 3 * hidden_size), bound, dtype),
                    "w_hh": _uniform(k2, (hidden_size, 3 * hidden_size), bound, dtype),
                    "b_ih": _uniform(k3, (3 * hidden_size,), bound, dtype),
                    "b_hh": _uniform(k4, (3 * hidden_size,), bound, dtype),
                }
            )
        layers.append(dir_params)
    return {"layers": layers}


def _gru_cell_step(p: dict, xw_t: jnp.ndarray, h: jnp.ndarray, H: int):
    """One GRU cell step given the precomputed input projection
    (= x_t @ W_ih + b_ih).  torch semantics: the candidate gate applies the
    reset gate to the *hidden projection*, n = tanh(x_n + r * (h @ W_hn + b_hn))."""
    hw = h @ p["w_hh"] + p["b_hh"]
    r = jax.nn.sigmoid(xw_t[:, 0 * H : 1 * H] + hw[:, 0 * H : 1 * H])
    z = jax.nn.sigmoid(xw_t[:, 1 * H : 2 * H] + hw[:, 1 * H : 2 * H])
    n = jnp.tanh(xw_t[:, 2 * H : 3 * H] + r * hw[:, 2 * H : 3 * H])
    return (1.0 - z) * n + z * h


def _gru_scan_direction(p: dict, x: jnp.ndarray, lens: jnp.ndarray, reverse: bool):
    """One GRU direction over [B, L, D] with the same masked variable-length
    semantics as :func:`_scan_direction`.  Returns (outputs [B, L, H], h_T)."""
    B, L, _ = x.shape
    H = p["w_hh"].shape[0]
    xw = x @ p["w_ih"] + p["b_ih"]        # [B, L, 3H], single MXU matmul
    h0 = jnp.zeros((B, H), x.dtype)
    ts = jnp.arange(L)
    if reverse:
        ts = ts[::-1]

    def step(h, t):
        h_new = _gru_cell_step(p, xw[:, t, :], h, H)
        upd = (t < lens)[:, None]
        h = jnp.where(upd, h_new, h)
        return h, jnp.where(upd, h, 0.0)

    hT, outs = jax.lax.scan(step, h0, ts)
    outs = jnp.swapaxes(outs, 0, 1)
    if reverse:
        outs = outs[:, ::-1, :]
    return outs, hT


def gru_apply(
    params: dict,
    x: jnp.ndarray,
    lens: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (memory_bank [B, L, dirs*H], h_final [num_layers*dirs, B, H])
    in torch layout, mirroring :func:`lstm_apply` (GRU carries no cell state)."""
    rngs = RngStream(rng)
    layers = params["layers"]
    num_layers = len(layers)
    h_finals = []
    out = x
    for l, dir_params in enumerate(layers):
        feats = []
        for d, p in enumerate(dir_params):
            o, hT = _gru_scan_direction(p, out, lens, reverse=(d == 1))
            feats.append(o)
            h_finals.append(hT)
        out = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
        if l < num_layers - 1:
            out = dropout(out, dropout_rate, rngs.next(f"gru_l{l}"), train)
    return out, jnp.stack(h_finals, axis=0)


def lstm_apply(
    params: dict,
    x: jnp.ndarray,
    lens: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray]]:
    """Returns (memory_bank [B, L, dirs*H], (h_final, c_final)) where
    h_final/c_final are [num_layers*dirs, B, H] in torch layout
    (l0_fwd, l0_bwd, l1_fwd, l1_bwd, ...).  Inter-layer dropout applies to
    every layer's output except the last, like ``nn.LSTM(dropout=...)``."""
    rngs = RngStream(rng)
    layers = params["layers"]
    num_layers = len(layers)
    h_finals, c_finals = [], []
    out = x
    for l, dir_params in enumerate(layers):
        feats = []
        for d, p in enumerate(dir_params):
            o, hT, cT = _scan_direction(p, out, lens, reverse=(d == 1))
            feats.append(o)
            h_finals.append(hT)
            c_finals.append(cT)
        out = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
        if l < num_layers - 1:
            out = dropout(out, dropout_rate, rngs.next(f"lstm_l{l}"), train)
    h_final = jnp.stack(h_finals, axis=0)
    c_final = jnp.stack(c_finals, axis=0)
    return out, (h_final, c_final)
