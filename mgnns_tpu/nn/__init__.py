"""Functional neural-net primitives: pure pytree params + apply functions.

Every module is a pair of functions — ``<name>_init(key, ...) -> params`` and
``<name>_apply(params, inputs, ...) -> outputs`` — with no hidden state, so
everything composes cleanly under ``jax.jit`` / ``jax.grad`` / ``pjit``.
Initialization distributions deliberately match the reference's PyTorch
modules so training dynamics are comparable.
"""

from mgnns_tpu.nn import core, lstm, attention, text_gcn, image_gcn, resnet

__all__ = ["core", "lstm", "attention", "text_gcn", "image_gcn", "resnet"]
