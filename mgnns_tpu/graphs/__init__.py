"""Host-side graph construction: vocab, PMI word graph, co-occurrence adjacency."""

from mgnns_tpu.graphs.vocab import build_vocab, load_vocab, get_vocab_list, save_vocab
from mgnns_tpu.graphs.pmi import PmiGraph, cal_pmi, pad_and_filter
from mgnns_tpu.graphs.cooccur import (
    gen_A,
    gen_adj,
    build_cooccurrence,
    load_adj_pickle,
)

__all__ = [
    "build_vocab",
    "load_vocab",
    "get_vocab_list",
    "save_vocab",
    "PmiGraph",
    "cal_pmi",
    "pad_and_filter",
    "gen_A",
    "gen_adj",
    "build_cooccurrence",
    "load_adj_pickle",
]
