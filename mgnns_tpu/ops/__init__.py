"""Compute ops namespace: re-exports the functional primitives and kernels.

The implementation lives in :mod:`mgnns_tpu.nn` (pure functional layers) and
:mod:`mgnns_tpu.kernels` (Pallas); this module provides the conventional
``ops`` entry point for op-level users.
"""

from mgnns_tpu.kernels.edge_max import window_max_aggregate_pallas
from mgnns_tpu.nn.attention import (
    add_positional_encoding,
    ffn_apply,
    ffn_init,
    head_diversity,
    label_attention_apply,
    label_attention_init,
    mha_apply,
    mha_init,
    my_another_mha_apply,
    my_another_mha_init,
    my_mha_apply,
    my_mha_init,
    positional_encoding_table,
)
from mgnns_tpu.nn.coattention import (
    coattention_apply,
    coattention_init,
    masked_max,
    masked_mean,
    masked_softmax,
)
from mgnns_tpu.nn.core import (
    dropout,
    embedding_apply,
    embedding_init,
    layer_norm_apply,
    layer_norm_init,
    leaky_relu,
    linear_apply,
    linear_init,
)
from mgnns_tpu.nn.image_gcn import graph_conv_apply, graph_conv_init
from mgnns_tpu.nn.lstm import gru_apply, gru_init, lstm_apply, lstm_init
from mgnns_tpu.nn.resnet import (
    import_torch_state_dict,
    resnet_apply,
    resnet_init,
)
from mgnns_tpu.nn.text_gcn import (
    text_gcn_apply,
    text_gcn_init,
    unique_word_readout,
    window_max_aggregate,
)

__all__ = [name for name in dir() if not name.startswith("_")]
