"""PIL decode-path tests: need only Pillow + tmp_path (no reference data)."""

import numpy as np

from mgnns_tpu.data import images as I


def test_pil_backend_real_file(tmp_path):
    """The PIL decode path with an actual JPEG on disk (not the synthetic
    fallback), eval and train transforms, uint8 and float formats."""
    import random
    from PIL import Image

    img_path = tmp_path / "real.jpg"
    arr = (np.random.default_rng(0).random((80, 120, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(img_path, "JPEG")

    out = I.load_image_uint8(str(img_path), size=64, train=False, rng=None,
                             backend="pil", sample_key="k")
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # decoded content, not the synthetic fallback
    synth = I.synthetic_image_uint8("k", 64)
    assert not np.array_equal(out, synth)

    tr = I.load_image_uint8(str(img_path), size=64, train=True,
                            rng=random.Random(0), backend="pil", sample_key="k")
    assert tr.shape == (64, 64, 3)

    fl = I.load_image(str(img_path), size=64, train=False, rng=None,
                      backend="pil", sample_key="k")
    assert fl.dtype == np.float32
    # float path == uint8 path + on-device-style normalization
    np.testing.assert_allclose(
        fl, I.normalize(out.astype(np.float32) / 255.0), atol=1e-5)

    # corrupt file falls back to synthetic
    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"not an image")
    fb = I.load_image_uint8(str(bad), size=64, train=False, rng=None,
                            backend="pil", sample_key="k")
    np.testing.assert_array_equal(fb, synth)
