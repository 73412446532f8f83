"""Measure the reference-CPU baseline throughput for bench.py.

The reference (single CUDA GPU, PyTorch) cannot run in this image (no DGL /
word2vec / apex, no GPU), so the baseline follows BASELINE.json's
"reference-CPU samples/sec" definition: the torch-CPU forward cost of the
reference model's dominant compute — the two ResNet trunks (ResNet-101 +
Places-ResNet-50) at image 448 — which lower-bounds the reference's true
per-sample cost (ignoring its LSTM/GCN/attention and its Python-side graph
building entirely, i.e. biased *against* us).

Writes ``bench_baseline.json`` at the repo root; ``bench.py`` divides its
measured TPU throughput by this number.
"""

import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.test_resnet import TorchTrunk  # torch replica built from the arch spec
from mgnns_tpu.nn.resnet import RESNET_LAYERS


def main():
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    r101 = TorchTrunk(RESNET_LAYERS[101]).eval()
    r50 = TorchTrunk(RESNET_LAYERS[50]).eval()
    B = 4
    x = torch.randn(B, 3, 448, 448)
    with torch.no_grad():
        # warmup
        r101(x)
        r50(x)
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            r101(x)
            r50(x)
        dt = time.time() - t0
    sps = B * iters / dt
    out = {
        "reference_cpu_samples_per_sec": sps,
        "method": "torch-CPU fp32 forward of ResNet-101 + ResNet-50 trunks @448 (the "
                  "reference's dominant per-sample compute; excludes its LSTM/GCN/attention "
                  "and per-doc Python graph build, so this overstates reference speed)",
        "batch": B,
        "threads": torch.get_num_threads(),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_baseline.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
