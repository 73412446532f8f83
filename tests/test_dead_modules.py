"""The reference's dead-but-checkpointed modules: GRU ``rnn``
(Multi_GCN_Multihead_att.py:172-177), gates (:186-187), ``linear_1..3``
(:316-326), ``text_object_text``/``text_place_text`` attention (:214-245),
Text_GCN's unused head (Text_GCN.py:95), and PositionalEncoding
(submodules.py:159-182).  None run in the reference forward, but all except
PositionalEncoding are constructed in ``__init__`` and therefore present in
every reference checkpoint — ``include_dead_modules=True`` makes our
export/import round-trip them for strict state_dict interop."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from mgnns_tpu.config import ModelConfig
from mgnns_tpu.engine.optim import label_params
from mgnns_tpu.graphs import gen_A
from mgnns_tpu.models import mgnns_init, mgnns_apply
from mgnns_tpu.models.import_reference import (
    export_reference_state_dict,
    import_reference_state_dict,
)
from mgnns_tpu.nn import attention, lstm


# ---------------------------------------------------------------------------
# GRU vs torch.nn.GRU (packed-sequence semantics, like the LSTM oracle test)


def _copy_gru_to_torch(params, tl, num_layers, bidirectional):
    dirs = 2 if bidirectional else 1
    with torch.no_grad():
        for l in range(num_layers):
            for d in range(dirs):
                suffix = "_reverse" if d == 1 else ""
                p = params["layers"][l][d]
                getattr(tl, f"weight_ih_l{l}{suffix}").copy_(
                    torch.from_numpy(np.asarray(p["w_ih"]).T))
                getattr(tl, f"weight_hh_l{l}{suffix}").copy_(
                    torch.from_numpy(np.asarray(p["w_hh"]).T))
                getattr(tl, f"bias_ih_l{l}{suffix}").copy_(
                    torch.from_numpy(np.asarray(p["b_ih"])))
                getattr(tl, f"bias_hh_l{l}{suffix}").copy_(
                    torch.from_numpy(np.asarray(p["b_hh"])))


@pytest.mark.parametrize("num_layers,bidirectional", [(1, False), (2, True)])
def test_gru_matches_torch_packed(rng, num_layers, bidirectional):
    B, L, D, H = 5, 9, 6, 4
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lens = np.array([9, 7, 1, 4, 9])
    params = lstm.gru_init(jax.random.key(0), D, H, num_layers, bidirectional)

    tl = torch.nn.GRU(D, H, num_layers, bidirectional=bidirectional,
                      batch_first=True)
    _copy_gru_to_torch(params, tl, num_layers, bidirectional)

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lens), batch_first=True,
        enforce_sorted=False)
    out_t, h_t = tl(packed)
    out_t, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_t, batch_first=True, total_length=L)

    out_j, h_j = lstm.gru_apply(params, jnp.asarray(x), jnp.asarray(lens))

    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t.detach().numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# PositionalEncoding vs the reference formula (submodules.py:167-179),
# re-computed here per-position exactly as the reference's list comprehension


def _oracle_sinusoid_table(n_position, d_hid):
    def angle_vec(position):
        return [position / np.power(10000, 2 * (j // 2) / d_hid)
                for j in range(d_hid)]

    table = np.array([angle_vec(p) for p in range(n_position)])
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table.astype(np.float32)


def test_positional_encoding_matches_reference_formula():
    ours = np.asarray(attention.positional_encoding_table(14, n_position=23))
    np.testing.assert_allclose(ours, _oracle_sinusoid_table(23, 14), atol=1e-6)


def test_add_positional_encoding_truncates_and_stops_gradient(rng):
    table = attention.positional_encoding_table(6, n_position=50)
    x = jnp.asarray(rng.standard_normal((2, 7, 6)).astype(np.float32))
    y = attention.add_positional_encoding(x, table)
    np.testing.assert_allclose(np.asarray(y - x),
                               np.broadcast_to(np.asarray(table[:7]), (2, 7, 6)),
                               atol=1e-6)
    # the table is a buffer, not a parameter (reference registers a buffer
    # and detaches on use): no gradient flows into it
    g = jax.grad(lambda t: attention.add_positional_encoding(x, t).sum())(table)
    assert float(jnp.abs(g).max()) == 0.0


# ---------------------------------------------------------------------------
# include_dead_modules: init -> export -> strict key set -> import round trip


@pytest.fixture(scope="module")
def built_with_dead():
    r = np.random.default_rng(0)
    cfg = ModelConfig(vocab_size=60, edges_num=40, image_size=64,
                      object_num_classes=5, place_num_classes=6)
    oA, _ = gen_A(5, 0.4, {"nums": np.ones(5), "adj": np.ones((5, 5))})
    pA, _ = gen_A(6, 0.4, {"nums": np.ones(6), "adj": np.ones((6, 6))})
    params, stats, consts = mgnns_init(
        jax.random.key(0), cfg, num_edges=40,
        label_embedding=r.standard_normal((7, 300)).astype(np.float32),
        object_A=oA, place_A=pA, include_dead_modules=True)
    return cfg, params, stats, consts


# every key torch's strict load would demand for the dead modules, with the
# reference constructor shapes (GRU 300->150x2 bi, gates 600->300,
# linear pyramid 2048->1024->512->256, one MyAnotherMHA block per side,
# Text_GCN Linear 300->num_labels)
_EXPECTED_DEAD_KEYS = {
    "rnn.weight_ih_l0": (450, 300),
    "rnn.weight_hh_l0": (450, 150),
    "rnn.bias_ih_l0": (450,),
    "rnn.bias_hh_l0": (450,),
    "rnn.weight_ih_l0_reverse": (450, 300),
    "rnn.weight_ih_l1": (450, 300),
    "rnn.weight_hh_l1_reverse": (450, 150),
    "object_gate.weight": (300, 600),
    "object_gate.bias": (300,),
    "place_gate.weight": (300, 600),
    "object_linear_1.weight": (1024, 2048),
    "object_linear_2.weight": (512, 1024),
    "object_linear_3.weight": (256, 512),
    "place_linear_3.bias": (256,),
    "text_object_text_multi_head_att.slf_attn.w_qs.weight": (512, 300),
    "text_object_text_multi_head_att.slf_attn.layer_norm.gamma": (300,),
    "text_object_text_multi_head_att.pos_ffn.w_1.weight": (300, 300, 1),
    "text_place_text_multi_head_att.slf_attn.fc.weight": (300, 512),
    "text_place_text_multi_head_att.pos_ffn.layer_norm.beta": (300,),
    "text_features.Linear.weight": (7, 300),
    "text_features.Linear.bias": (7,),
}


def test_dead_modules_exported_with_reference_names_and_shapes(built_with_dead):
    _, params, stats, _ = built_with_dead
    sd = export_reference_state_dict(params, stats)
    for key, shape in _EXPECTED_DEAD_KEYS.items():
        assert key in sd, key
        assert sd[key].shape == shape, (key, sd[key].shape, shape)


def test_dead_modules_roundtrip_and_absent_without_flag(built_with_dead):
    _, params, stats, _ = built_with_dead
    sd = export_reference_state_dict(params, stats)
    p2, _ = import_reference_state_dict(sd)
    for name in ("rnn", "object_gate", "place_gate", "object_linear_1",
                 "place_linear_3", "text_object_text_mha",
                 "text_place_text_mha", "text_head"):
        assert name in p2, name
        a = jax.tree_util.tree_leaves(params[name])
        b = jax.tree_util.tree_leaves(p2[name])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)

    # and a state_dict without them imports cleanly to a dead-free pytree
    for key in list(sd):
        if key.startswith(("rnn.", "object_gate", "place_gate",
                           "object_linear_1", "object_linear_2",
                           "object_linear_3", "place_linear_1",
                           "place_linear_2", "place_linear_3",
                           "text_object_text", "text_place_text",
                           "text_features.Linear")):
            del sd[key]
    p3, _ = import_reference_state_dict(sd)
    assert "rnn" not in p3 and "text_head" not in p3


def test_dead_modules_always_frozen_in_optimizer(built_with_dead):
    _, params, _, _ = built_with_dead
    for faithful in (False, True):
        labels = label_params(params, faithful=faithful)
        for name in ("rnn", "object_gate", "place_gate", "object_linear_2",
                     "text_object_text_mha", "text_head"):
            for leaf in jax.tree_util.tree_leaves(labels[name]):
                assert leaf == "frozen", (name, faithful)


def test_cli_include_dead_modules_checkpointed(tmp_path):
    """--include_dead_modules through the real CLI: the saved checkpoint
    carries the dead subtrees (their freezing is asserted in
    test_dead_modules_always_frozen_in_optimizer)."""
    import os
    REF = "/root/reference/data"
    if not os.path.exists(REF):
        pytest.skip("reference data unavailable")
    from mgnns_tpu.cli.main import main
    from mgnns_tpu.engine.checkpoint import Checkpointer

    res = main([
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val", "--test_phase", "val",
        "--epochs", "1", "-b", "4", "--limit_samples", "4",
        "--image-size", "32", "--bn_mode", "frozen", "--freeze_trunks",
        "--lr", "1e-3", "--include_dead_modules",
        "--save_model_path", str(tmp_path / "ckpt"),
        "--save_experiment_result_path", str(tmp_path / "exp"),
        "--save_pred_result_path", str(tmp_path / "pred"),
    ])
    assert np.isfinite(res["history"][0]["train"]["loss"])
    ck = Checkpointer(str(tmp_path / "ckpt" / "mgnns_tpu"))
    state = ck.restore()
    ck.close()
    params = state["params"]
    for name in ("rnn", "object_gate", "place_linear_2",
                 "text_object_text_mha", "text_head"):
        assert name in params, name
    w = np.asarray(params["object_gate"]["w"])
    assert np.isfinite(w).all() and w.std() > 0


def test_forward_ignores_dead_modules(built_with_dead):
    """mgnns_apply output is bit-identical with and without the dead params."""
    cfg, params, stats, consts = built_with_dead
    r = np.random.default_rng(1)
    B, L = 2, 8
    batch = {
        "ids": jnp.asarray(r.integers(1, 60, (B, L)).astype(np.int32)),
        "lens": jnp.full((B,), L, jnp.int32),
        "mask": jnp.ones((B, L), jnp.float32),
        "eids": jnp.asarray(r.integers(0, 40, (B, L, 9)).astype(np.int32)),
        "image": jnp.asarray(r.standard_normal((B, 64, 64, 3)).astype(np.float32)),
        "object_inp": jnp.asarray(r.standard_normal((5, 300)).astype(np.float32)),
        "place_inp": jnp.asarray(r.standard_normal((6, 300)).astype(np.float32)),
    }
    with_dead, _, _ = mgnns_apply(params, stats, consts, batch, cfg=cfg, train=False)
    dead = {"rnn", "object_gate", "place_gate", "text_head",
            "text_object_text_mha", "text_place_text_mha",
            *(f"{s}_linear_{i}" for s in ("object", "place") for i in (1, 2, 3))}
    slim = {k: v for k, v in params.items() if k not in dead}
    without, _, _ = mgnns_apply(slim, stats, consts, batch, cfg=cfg, train=False)
    np.testing.assert_array_equal(np.asarray(with_dead), np.asarray(without))
