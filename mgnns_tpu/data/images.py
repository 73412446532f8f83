"""Image transforms: Warp (eval) and MultiScaleCrop + flip (train).

Re-implements reference ``utils/util.py:67-146`` and the transform assembly
in the engine (``engine/Multi_GCN_Multihead_Att_engine.py:276-299``):

- eval: ``Warp(size)`` bilinear square resize -> ToTensor -> ImageNet
  normalize;
- train: ``MultiScaleCrop(size, scales=[1, .875, .75, .66], max_distort=1,
  fix_crop)`` -> random horizontal flip -> ToTensor -> normalize.

Note: the reference's scale list is ``[1, 875, .75, .66]`` — an evident typo
(a crop 875x the base size); this implementation uses the intended 0.875 and
documents the deviation.

Because the reference checkout ships no image files, a deterministic
synthetic backend generates pixels keyed by the sample id so end-to-end runs
and benchmarks are reproducible without the TumEmo image dump.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

MULTISCALE_SCALES = (1.0, 0.875, 0.75, 0.66)


def normalize(img01: np.ndarray) -> np.ndarray:
    """[H, W, 3] float in [0, 1] -> ImageNet-normalized float32."""
    return ((img01 - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def warp(pil_img, size: int):
    """Square bilinear resize (reference ``Warp``, ``utils/util.py:67-77``)."""
    from PIL import Image

    return pil_img.resize((size, size), Image.BILINEAR)


def _fill_fix_offset(more_fix_crop: bool, image_w: int, image_h: int, crop_w: int, crop_h: int):
    """Candidate crop anchors (reference ``:123-146``)."""
    w_step = (image_w - crop_w) // 4
    h_step = (image_h - crop_h) // 4
    ret = [(0, 0), (4 * w_step, 0), (0, 4 * h_step), (4 * w_step, 4 * h_step),
           (2 * w_step, 2 * h_step)]
    if more_fix_crop:
        ret += [(0, 2 * h_step), (4 * w_step, 2 * h_step), (2 * w_step, 4 * h_step),
                (2 * w_step, 0), (1 * w_step, 1 * h_step), (3 * w_step, 1 * h_step),
                (1 * w_step, 3 * h_step), (3 * w_step, 3 * h_step)]
    return ret


def multi_scale_crop(pil_img, size: int, rng: random.Random, *,
                     scales=MULTISCALE_SCALES, max_distort: int = 1,
                     more_fix_crop: bool = True):
    """Reference ``MultiScaleCrop.__call__`` (``utils/util.py:89-121``)."""
    from PIL import Image

    image_w, image_h = pil_img.size
    base = min(image_w, image_h)
    crop_sizes = [int(base * s) for s in scales]
    crop_h = [size if abs(x - size) < 3 else x for x in crop_sizes]
    crop_w = [size if abs(x - size) < 3 else x for x in crop_sizes]
    pairs = [(w, h) for i, h in enumerate(crop_h) for j, w in enumerate(crop_w)
             if abs(i - j) <= max_distort]
    cw, ch = rng.choice(pairs)
    ow, oh = rng.choice(_fill_fix_offset(more_fix_crop, image_w, image_h, cw, ch))
    crop = pil_img.crop((ow, oh, ow + cw, oh + ch))
    return crop.resize((size, size), Image.BILINEAR)


def eval_transform(pil_img, size: int) -> np.ndarray:
    arr = np.asarray(warp(pil_img, size), np.float32) / 255.0
    return normalize(arr)


def train_transform(pil_img, size: int, rng: random.Random) -> np.ndarray:
    img = multi_scale_crop(pil_img, size, rng)
    if rng.random() < 0.5:
        img = img.transpose(0)  # PIL FLIP_LEFT_RIGHT == Transpose method 0
    arr = np.asarray(img, np.float32) / 255.0
    return normalize(arr)


def synthetic_image(key: str, size: int) -> np.ndarray:
    """Deterministic pseudo-image for a sample id: smooth gradients + coarse
    noise seeded by a hash, already normalized.  Stands in for missing image
    files; generated at 1/8 resolution and upsampled so its host cost is
    comparable to a real JPEG decode rather than dominating the pipeline."""
    seed = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    g = np.random.default_rng(seed)
    y = np.linspace(0, 1, size, dtype=np.float32)
    base = np.outer(y, y)[..., None] * g.uniform(0.2, 0.8, (1, 1, 3)).astype(np.float32)
    small = max(size // 8, 1)
    factor = -(-size // small)  # ceil: cover any size, then crop
    coarse = g.normal(0, 0.05, (small, small, 3)).astype(np.float32)
    noise = np.repeat(np.repeat(coarse, factor, 0), factor, 1)[:size, :size]
    return normalize(np.clip(base + noise + 0.3, 0.0, 1.0))


def synthetic_image_uint8(key: str, size: int) -> np.ndarray:
    """uint8 variant of :func:`synthetic_image` (pre-normalization pixels)."""
    seed = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    g = np.random.default_rng(seed)
    y = np.linspace(0, 1, size, dtype=np.float32)
    base = np.outer(y, y)[..., None] * g.uniform(0.2, 0.8, (1, 1, 3)).astype(np.float32)
    small = max(size // 8, 1)
    factor = -(-size // small)  # ceil: cover any size, then crop
    coarse = g.normal(0, 0.05, (small, small, 3)).astype(np.float32)
    noise = np.repeat(np.repeat(coarse, factor, 0), factor, 1)[:size, :size]
    return (np.clip(base + noise + 0.3, 0.0, 1.0) * 255).astype(np.uint8)


def load_image(path: str, *, size: int, train: bool, rng: random.Random | None,
               backend: str = "pil", sample_key: str = "") -> np.ndarray:
    """Decode + transform one image -> [size, size, 3] float32 NHWC slice.

    ``backend='synthetic'`` (or a missing/corrupt file) falls back to
    :func:`synthetic_image`.
    """
    if backend == "pil":
        try:
            from PIL import Image

            with Image.open(path) as im:
                im = im.convert("RGB")
                if train:
                    return train_transform(im, size, rng or random.Random(0))
                return eval_transform(im, size)
        except (FileNotFoundError, OSError):
            pass
    return synthetic_image(sample_key or path, size)


def load_image_uint8(path: str, *, size: int, train: bool, rng: random.Random | None,
                     backend: str = "pil", sample_key: str = "") -> np.ndarray:
    """Like :func:`load_image` but returns raw uint8 pixels [size, size, 3];
    the ImageNet normalization runs on device (see
    :func:`mgnns_tpu.models.mgnns.normalize_image_batch`).  Quarters the
    host->device bytes and removes three full-size float passes from the
    host path."""
    if backend == "pil":
        try:
            from PIL import Image

            with Image.open(path) as im:
                im = im.convert("RGB")
                if train:
                    r = rng or random.Random(0)  # one rng for crop AND flip
                    im = multi_scale_crop(im, size, r)
                    if r.random() < 0.5:
                        im = im.transpose(0)
                else:
                    im = warp(im, size)
                return np.asarray(im, np.uint8)
        except (FileNotFoundError, OSError):
            pass
    return synthetic_image_uint8(sample_key or path, size)
