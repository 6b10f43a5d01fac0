"""MKV store round-trip + native transform parity vs PIL."""

import numpy as np
import pytest

from idvs.morec_tpu.data.imagestore import (BatchTransform, MKVStore,
                                            build_mkv_from_images, write_mkv,
                                            _native_lib)


def test_mkv_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    recs = [(f"{i}".encode(), rng.integers(0, 256, size=(10 + i, 12, 3),
                                           dtype=np.uint8))
            for i in range(5)]
    path = str(tmp_path / "imgs.mkv")
    n = write_mkv(path, iter(recs))
    assert n == 5
    store = MKVStore(path)
    assert len(store) == 5
    for key, arr in recs:
        np.testing.assert_array_equal(store.get(key), arr)
    store.close()


def test_build_from_images(tmp_path):
    from PIL import Image
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in (1, 2, 3):
        Image.fromarray(rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
                        ).save(img_dir / f"{i}.jpg")
    manifest = tmp_path / "manifest.tsv"
    manifest.write_text("v1\tx\nv2\tx\nv3\tx\nv9\tx\n")  # v9 missing
    out = str(tmp_path / "store.mkv")
    n, bad = build_mkv_from_images(str(img_dir), str(manifest), out)
    assert n == 3 and bad == ["v9"]
    store = MKVStore(out)
    assert store.get(b"1").shape == (20, 24, 3)


def test_native_transform_matches_pil():
    lib = _native_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8),
            rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8),
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)]  # upscale
    native = BatchTransform(32)
    assert native._lib is not None
    python = BatchTransform(32, force_python=True)
    a = native(imgs)
    b = python(imgs)
    assert a.shape == b.shape == (3, 32, 32, 3)
    # PIL uses 8-bit fixed-point filter coefficients; allow ~2/255 in [-1,1]
    assert np.abs(a - b).max() < 0.02


def test_transform_value_range_and_layout():
    img = np.full((8, 8, 3), 255, np.uint8)
    out = BatchTransform(4, force_python=True)([img])
    np.testing.assert_allclose(out, 1.0, atol=1e-6)
    img0 = np.zeros((8, 8, 3), np.uint8)
    out0 = BatchTransform(4, force_python=True)([img0])
    np.testing.assert_allclose(out0, -1.0, atol=1e-6)
