"""Pallas TPU kernels for the hot custom ops."""

from mgnns_tpu.kernels.edge_max import window_max_aggregate_pallas

__all__ = ["window_max_aggregate_pallas"]
