"""Weight-level interop with reference (PyTorch) checkpoints.

:func:`import_reference_state_dict` converts a torch ``state_dict`` of the
reference ``Multi_GCN_Multihead_Att`` model (reference
``models/Multi_GCN_Multihead_att.py:135-351``; checkpoints written by
``engine/...:624-643``) into this framework's (params, batch_stats) pytrees;
:func:`export_reference_state_dict` does the reverse, so models trained here
can be loaded by reference-compatible tooling.

Name map (torch -> ours); torch ``nn.Linear`` weights are [out, in] and are
transposed, Conv1d position-wise weights [out, in, 1] are squeezed+transposed,
LSTM matrices [4H, D] are transposed:

  embedding.weight                          embedding.table (pad row zeroed)
  lstm.weight_ih_l{l}[_reverse] ...         lstm.layers[l][dir].{w_ih,w_hh,b_ih,b_hh}
  text_features.node_hidden.weight          text_gcn.node_embedding
  text_features.seq_edge_w.weight           text_gcn.edge_weight
  object_features.{0,1,4..7}.*              object_trunk.* (Sequential index ->
                                            torchvision names -> resnet importer)
  place_features.{0,1,4..7}.*               place_trunk.*
  liner_img_{object,place}.*                liner_img_{object,place}.{w,b}
  gc1.weight / gc2.weight                   gc1.w / gc2.w  (already [in, out])
  {object,place}_attention.{w_q,w_k,w_v,fc} {object,place}_attention.*
  {object,place}_linear_5, _x_linear        same names, .{w,b}
  *_multi_head_att.{i}.slf_attn.*           *_mha[i].slf_attn.{w_qs,w_ks,w_vs,fc,ln}
  *_multi_head_att.{i}.pos_ffn.*            *_mha[i].pos_ffn.{w_1,w_2,ln}
  multi_linear_{1,2}.*                      multi_linear_{1,2}.{w,b}
  object_A / place_A                        object_A / place_A

Dead reference modules — constructed by the reference ``__init__`` but never
used in its forward, so present in every reference checkpoint: ``rnn`` (GRU,
``:172-177``), ``object/place_gate`` (``:186-187``), ``object/place_linear_1..3``
(``:316-326``), the ``text_object_text``/``text_place_text`` attention blocks
(``:214-245``), and ``text_features.Linear`` (``Text_GCN.py:95``) — round-trip
when present: import picks up every COMPLETE dead module it finds in the
state_dict (no flag — a real reference checkpoint always carries them, and
they cost nothing: the forward never reads them and the optimizer freezes
them), treating a partial subtree (pruned/truncated checkpoint) as absent;
export emits them only when the params carry them (i.e. the model was built
with ``mgnns_init(include_dead_modules=True)``), which is what makes a
reference-side ``load_state_dict(strict=True)`` succeed.  To get a
dead-free pytree from a reference checkpoint, drop the keys before import
or prune the known names from the result.
"""

from __future__ import annotations

import numpy as np

from mgnns_tpu.nn import resnet

_MHA_STACKS = {
    "img_object_text_multi_head_att": "img_object_text_mha",
    "img_place_text_multi_head_att": "img_place_text_mha",
    "text_img_object_multi_head_att": "text_img_object_mha",
    "text_img_place_multi_head_att": "text_img_place_mha",
}
_TRUNK_SEQ = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
              "6": "layer3", "7": "layer4"}


def _arr(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _linear(sd, name):
    p = {"w": _arr(sd[f"{name}.weight"]).T.astype(np.float32)}
    if f"{name}.bias" in sd:
        p["b"] = _arr(sd[f"{name}.bias"]).astype(np.float32)
    return p


def _conv1d_linear(sd, name):
    return {"w": _arr(sd[f"{name}.weight"])[:, :, 0].T.astype(np.float32),
            "b": _arr(sd[f"{name}.bias"]).astype(np.float32)}


def _ln(sd, name):
    return {"gamma": _arr(sd[f"{name}.gamma"]).astype(np.float32),
            "beta": _arr(sd[f"{name}.beta"]).astype(np.float32)}


def _trunk_subdict(sd, prefix):
    """Extract 'object_features.*' into torchvision-style names."""
    out = {}
    plen = len(prefix) + 1
    for k, v in sd.items():
        if not k.startswith(prefix + "."):
            continue
        rest = k[plen:]
        idx, _, tail = rest.partition(".")
        if idx in _TRUNK_SEQ:
            out[f"{_TRUNK_SEQ[idx]}" + ("." + tail if tail else "")] = v
    return out


def _mha_block(sd, prefix):
    slf = {
        "w_qs": _linear(sd, f"{prefix}.slf_attn.w_qs"),
        "w_ks": _linear(sd, f"{prefix}.slf_attn.w_ks"),
        "w_vs": _linear(sd, f"{prefix}.slf_attn.w_vs"),
        "fc": _linear(sd, f"{prefix}.slf_attn.fc"),
        "ln": _ln(sd, f"{prefix}.slf_attn.layer_norm"),
    }
    ffn = {
        "w_1": _conv1d_linear(sd, f"{prefix}.pos_ffn.w_1"),
        "w_2": _conv1d_linear(sd, f"{prefix}.pos_ffn.w_2"),
        "ln": _ln(sd, f"{prefix}.pos_ffn.layer_norm"),
    }
    return {"slf_attn": slf, "pos_ffn": ffn}


def import_reference_state_dict(sd: dict, *, num_layers: int = 2,
                                bidirectional: bool = True,
                                stack_num: int = 2) -> tuple[dict, dict]:
    """Returns (params, batch_stats) matching :func:`mgnns_tpu.models.mgnns_init`."""
    p: dict = {}
    s: dict = {}

    emb = _arr(sd["embedding.weight"]).astype(np.float32).copy()
    emb[0] = 0.0
    p["embedding"] = {"table": emb}

    dirs = 2 if bidirectional else 1
    layers = []
    for l in range(num_layers):
        dir_params = []
        for d in range(dirs):
            suf = "_reverse" if d == 1 else ""
            dir_params.append({
                "w_ih": _arr(sd[f"lstm.weight_ih_l{l}{suf}"]).T.astype(np.float32),
                "w_hh": _arr(sd[f"lstm.weight_hh_l{l}{suf}"]).T.astype(np.float32),
                "b_ih": _arr(sd[f"lstm.bias_ih_l{l}{suf}"]).astype(np.float32),
                "b_hh": _arr(sd[f"lstm.bias_hh_l{l}{suf}"]).astype(np.float32),
            })
        layers.append(dir_params)
    p["lstm"] = {"layers": layers}

    p["text_gcn"] = {
        "node_embedding": _arr(sd["text_features.node_hidden.weight"]).astype(np.float32),
        "edge_weight": _arr(sd["text_features.seq_edge_w.weight"]).astype(np.float32),
    }

    for side, depth in (("object", 101), ("place", 50)):
        sub = _trunk_subdict(sd, f"{side}_features")
        p[f"{side}_trunk"], s[f"{side}_trunk"] = resnet.import_torch_state_dict(sub, depth)
        p[f"liner_img_{side}"] = _linear(sd, f"liner_img_{side}")
        p[f"{side}_attention"] = {
            "w_q": _linear(sd, f"{side}_attention.w_q"),
            "w_k": _linear(sd, f"{side}_attention.w_k"),
            "w_v": _linear(sd, f"{side}_attention.w_v"),
            "fc": _linear(sd, f"{side}_attention.fc"),
        }
        p[f"{side}_linear_5"] = _linear(sd, f"{side}_linear_5")
        p[f"{side}_x_linear"] = _linear(sd, f"{side}_x_linear")
        p[f"{side}_A"] = _arr(sd[f"{side}_A"]).astype(np.float32)

    p["gc1"] = {"w": _arr(sd["gc1.weight"]).astype(np.float32)}
    p["gc2"] = {"w": _arr(sd["gc2.weight"]).astype(np.float32)}

    for torch_name, ours in _MHA_STACKS.items():
        p[ours] = [_mha_block(sd, f"{torch_name}.{i}") for i in range(stack_num)]

    p["multi_linear_1"] = _linear(sd, "multi_linear_1")
    p["multi_linear_2"] = _linear(sd, "multi_linear_2")

    # dead-but-checkpointed reference modules (module docstring): round-trip
    # them when the state_dict carries them.  A PARTIAL key set (a pruned or
    # strict=False-truncated checkpoint) is treated as the module being
    # absent — real reference checkpoints carry each module whole or not at
    # all, and the import contract is to tolerate, not to crash.
    def _maybe(assign_name, fn, *args):
        try:
            p[assign_name] = fn(*args)
        except KeyError:
            pass

    def _import_gru():
        layers = []
        for l in range(num_layers):
            dir_params = []
            for dd in range(dirs):
                suf = "_reverse" if dd == 1 else ""
                dir_params.append({
                    "w_ih": _arr(sd[f"rnn.weight_ih_l{l}{suf}"]).T.astype(np.float32),
                    "w_hh": _arr(sd[f"rnn.weight_hh_l{l}{suf}"]).T.astype(np.float32),
                    "b_ih": _arr(sd[f"rnn.bias_ih_l{l}{suf}"]).astype(np.float32),
                    "b_hh": _arr(sd[f"rnn.bias_hh_l{l}{suf}"]).astype(np.float32),
                })
            layers.append(dir_params)
        return {"layers": layers}

    if "rnn.weight_ih_l0" in sd:
        _maybe("rnn", _import_gru)
    for side in ("object", "place"):
        if f"{side}_gate.weight" in sd:
            _maybe(f"{side}_gate", _linear, sd, f"{side}_gate")
        for i in (1, 2, 3):
            if f"{side}_linear_{i}.weight" in sd:
                _maybe(f"{side}_linear_{i}", _linear, sd, f"{side}_linear_{i}")
        if f"text_{side}_text_multi_head_att.slf_attn.w_qs.weight" in sd:
            _maybe(f"text_{side}_text_mha", _mha_block,
                   sd, f"text_{side}_text_multi_head_att")
    if "text_features.Linear.weight" in sd:
        _maybe("text_head", _linear, sd, "text_features.Linear")
    import jax
    import jax.numpy as jnp

    to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return to_dev(p), to_dev(s)


# ---------------------------------------------------------------------------
# export


def _exp_linear(out, name, p):
    out[f"{name}.weight"] = np.asarray(p["w"]).T
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _exp_conv1d(out, name, p):
    out[f"{name}.weight"] = np.asarray(p["w"]).T[:, :, None]
    out[f"{name}.bias"] = np.asarray(p["b"])


def _exp_ln(out, name, p):
    out[f"{name}.gamma"] = np.asarray(p["gamma"])
    out[f"{name}.beta"] = np.asarray(p["beta"])


def _exp_trunk(out, prefix, params, stats, depth):
    seq_inv = {v: k for k, v in _TRUNK_SEQ.items()}

    def conv(name, p):
        out[f"{prefix}.{name}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)

    def bn(name, p, s):
        out[f"{prefix}.{name}.weight"] = np.asarray(p["scale"])
        out[f"{prefix}.{name}.bias"] = np.asarray(p["bias"])
        out[f"{prefix}.{name}.running_mean"] = np.asarray(s["mean"])
        out[f"{prefix}.{name}.running_var"] = np.asarray(s["var"])

    conv(seq_inv["conv1"], params["conv1"])
    bn(seq_inv["bn1"], params["bn1"], stats["bn1"])
    layers = resnet.RESNET_LAYERS[depth]
    for li, blocks in enumerate(layers, 1):
        seq = seq_inv[f"layer{li}"]
        lp, ls = params[f"layer{li}"], stats[f"layer{li}"]

        def block_at(b):
            if b == 0:
                return lp["first"], ls["first"]
            take = lambda t: np.asarray(t)[b - 1]
            import jax

            return (jax.tree_util.tree_map(take, lp["rest"]),
                    jax.tree_util.tree_map(take, ls["rest"]))

        for b in range(blocks):
            pb, sb = block_at(b)
            pre = f"{seq}.{b}"
            for ci in (1, 2, 3):
                conv(f"{pre}.conv{ci}", pb[f"conv{ci}"])
                bn(f"{pre}.bn{ci}", pb[f"bn{ci}"], sb[f"bn{ci}"])
            if "downsample_conv" in pb:
                conv(f"{pre}.downsample.0", pb["downsample_conv"])
                bn(f"{pre}.downsample.1", pb["downsample_bn"], sb["downsample_bn"])


def export_reference_state_dict(params: dict, batch_stats: dict) -> dict:
    """Our pytrees -> a reference-named numpy state_dict."""
    out: dict = {}
    out["embedding.weight"] = np.asarray(params["embedding"]["table"])
    for l, dir_params in enumerate(params["lstm"]["layers"]):
        for d, p in enumerate(dir_params):
            suf = "_reverse" if d == 1 else ""
            out[f"lstm.weight_ih_l{l}{suf}"] = np.asarray(p["w_ih"]).T
            out[f"lstm.weight_hh_l{l}{suf}"] = np.asarray(p["w_hh"]).T
            out[f"lstm.bias_ih_l{l}{suf}"] = np.asarray(p["b_ih"])
            out[f"lstm.bias_hh_l{l}{suf}"] = np.asarray(p["b_hh"])
    out["text_features.node_hidden.weight"] = np.asarray(params["text_gcn"]["node_embedding"])
    out["text_features.seq_edge_w.weight"] = np.asarray(params["text_gcn"]["edge_weight"])
    for side, depth in (("object", 101), ("place", 50)):
        _exp_trunk(out, f"{side}_features", params[f"{side}_trunk"],
                   batch_stats[f"{side}_trunk"], depth)
        _exp_linear(out, f"liner_img_{side}", params[f"liner_img_{side}"])
        for sub in ("w_q", "w_k", "w_v", "fc"):
            _exp_linear(out, f"{side}_attention.{sub}", params[f"{side}_attention"][sub])
        _exp_linear(out, f"{side}_linear_5", params[f"{side}_linear_5"])
        _exp_linear(out, f"{side}_x_linear", params[f"{side}_x_linear"])
        out[f"{side}_A"] = np.asarray(params[f"{side}_A"])
    out["gc1.weight"] = np.asarray(params["gc1"]["w"])
    out["gc2.weight"] = np.asarray(params["gc2"]["w"])
    for torch_name, ours in _MHA_STACKS.items():
        for i, blk in enumerate(params[ours]):
            pre = f"{torch_name}.{i}"
            for sub in ("w_qs", "w_ks", "w_vs", "fc"):
                _exp_linear(out, f"{pre}.slf_attn.{sub}", blk["slf_attn"][sub])
            _exp_ln(out, f"{pre}.slf_attn.layer_norm", blk["slf_attn"]["ln"])
            _exp_conv1d(out, f"{pre}.pos_ffn.w_1", blk["pos_ffn"]["w_1"])
            _exp_conv1d(out, f"{pre}.pos_ffn.w_2", blk["pos_ffn"]["w_2"])
            _exp_ln(out, f"{pre}.pos_ffn.layer_norm", blk["pos_ffn"]["ln"])
    _exp_linear(out, "multi_linear_1", params["multi_linear_1"])
    _exp_linear(out, "multi_linear_2", params["multi_linear_2"])

    # dead-but-checkpointed reference modules (module docstring): emit them
    # when the params carry them (mgnns_init(include_dead_modules=True)) so
    # the reference side can load_state_dict(strict=True)
    if "rnn" in params:
        for l, dir_params in enumerate(params["rnn"]["layers"]):
            for dd, p in enumerate(dir_params):
                suf = "_reverse" if dd == 1 else ""
                out[f"rnn.weight_ih_l{l}{suf}"] = np.asarray(p["w_ih"]).T
                out[f"rnn.weight_hh_l{l}{suf}"] = np.asarray(p["w_hh"]).T
                out[f"rnn.bias_ih_l{l}{suf}"] = np.asarray(p["b_ih"])
                out[f"rnn.bias_hh_l{l}{suf}"] = np.asarray(p["b_hh"])
    for side in ("object", "place"):
        if f"{side}_gate" in params:
            _exp_linear(out, f"{side}_gate", params[f"{side}_gate"])
        for i in (1, 2, 3):
            if f"{side}_linear_{i}" in params:
                _exp_linear(out, f"{side}_linear_{i}", params[f"{side}_linear_{i}"])
        if f"text_{side}_text_mha" in params:
            blk = params[f"text_{side}_text_mha"]
            pre = f"text_{side}_text_multi_head_att"
            for sub in ("w_qs", "w_ks", "w_vs", "fc"):
                _exp_linear(out, f"{pre}.slf_attn.{sub}", blk["slf_attn"][sub])
            _exp_ln(out, f"{pre}.slf_attn.layer_norm", blk["slf_attn"]["ln"])
            _exp_conv1d(out, f"{pre}.pos_ffn.w_1", blk["pos_ffn"]["w_1"])
            _exp_conv1d(out, f"{pre}.pos_ffn.w_2", blk["pos_ffn"]["w_2"])
            _exp_ln(out, f"{pre}.pos_ffn.layer_norm", blk["pos_ffn"]["ln"])
    if "text_head" in params:
        _exp_linear(out, "text_features.Linear", params["text_head"])
    return out
