"""Object/scene label co-occurrence adjacency construction and normalization.

Re-implements reference ``utils/util.py:325-426``:

- :func:`build_cooccurrence` — counts label occurrences and pairwise
  co-occurrence over per-sample label sets (``return_objects`` /
  ``generate_nums`` / ``generate_Adj`` / ``get_Adj``, ``:325-380``);
- :func:`gen_A` — conditional-probability threshold + reweighting
  (``:382-398``, the 4-arg ``gama`` form the paper intends, p ~= 0.2);
- :func:`gen_adj` — degree normalization ``((A D)^T) D`` with
  ``D = diag(deg^-1/2)`` (``:421-426``), as a pure jnp function usable inside
  jit.
"""

from __future__ import annotations

import pickle
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def build_cooccurrence(label_sets: Sequence[Sequence[int]], num_classes: int) -> dict:
    """Counts from per-sample *deduplicated* label lists.

    The reference dedupes each sample's labels before counting
    (``utils/util.py:332`` ``set(json_line['objects'])``) and increments the
    off-diagonal pair cells once per ordered pair per sample (``:347-356``);
    zero-count labels get num 1 to avoid 0/0 (``:371-374``).

    Returns a dict ``{'nums': [C], 'adj': [C, C]}`` matching the on-disk
    pickle format of ``data/adj/*.pkl``.
    """
    nums = np.zeros(num_classes, dtype=np.float64)
    adj = np.zeros((num_classes, num_classes), dtype=np.float64)
    for labels in label_sets:
        uniq = sorted(set(labels))
        for a in uniq:
            nums[a] += 1
        for a in uniq:
            for b in uniq:
                if a != b:
                    adj[a, b] += 1
    nums[nums == 0] = 1
    return {"nums": nums, "adj": adj}


def load_adj_pickle(path: str) -> dict:
    """Load a ``{'nums', 'adj'}`` co-occurrence pickle (``data/adj/*.pkl``)."""
    with open(path, "rb") as f:
        result = pickle.load(f)
    return {"nums": np.asarray(result["nums"]), "adj": np.asarray(result["adj"])}


def gen_A(num_classes: int, t: float, adj_data: dict | str, gama: float = 0.2) -> tuple[np.ndarray, np.ndarray]:
    """Threshold + reweight the co-occurrence matrix (reference
    ``utils/util.py:382-398``).

    Steps: P(j|i) = adj / nums[:, None]; binarize at ``t``; scale rows by
    ``gama / (column_sums + 1e-6)``; add ``(1 - gama) * I`` self-loops.

    Args:
      adj_data: either a loaded ``{'nums','adj'}`` dict or a pickle path.
    """
    if isinstance(adj_data, str):
        adj_data = load_adj_pickle(adj_data)
    _adj = np.array(adj_data["adj"], dtype=np.float64)
    _nums = np.array(adj_data["nums"], dtype=np.float64)[:, None]
    _adj = _adj / _nums
    _adj = np.where(_adj < t, 0.0, 1.0)
    _adj = _adj * gama / (_adj.sum(0, keepdims=True) + 1e-6)
    _adj = _adj + (1 - gama) * np.identity(num_classes, dtype=np.float64)
    return _adj, _nums


def gen_adj(A: jnp.ndarray) -> jnp.ndarray:
    """Degree normalization ``((A @ D)^T) @ D``, ``D = diag(rowsum(A)^-1/2)``
    (reference ``utils/util.py:421-426``).  Pure — safe under jit; the
    reference detaches the result (``models/Multi_GCN_Multihead_att.py:461``),
    which callers reproduce with ``jax.lax.stop_gradient``."""
    D = jnp.power(A.sum(axis=1), -0.5)
    AD = A * D[None, :]        # A @ diag(D) scales columns
    return AD.T * D[None, :]   # (A D)^T @ diag(D)
