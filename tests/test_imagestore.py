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


# ------------------------------------------------- LMDB compat (VERDICT r4.6)
def _pickle_as_main_lmdb_image(img: np.ndarray) -> bytes:
    """Pickle an LMDB_Image exactly the way the reference's builder does:
    the class lives in the SCRIPT'S module (__main__ when build_lmdb_hm.py
    runs, dataset/HM/build_lmdb_hm.py:13-22), so the pickle references
    '__main__.LMDB_Image' — the case a plain pickle.loads cannot resolve."""
    import pickle
    import sys
    import types

    mod = types.ModuleType("__main__")

    class LMDB_Image:
        def __init__(self, image, id):
            self.channels = image.shape[2]
            self.size = image.shape[:2]
            self.image = image.tobytes()
            self.id = id

    LMDB_Image.__module__ = "__main__"
    LMDB_Image.__qualname__ = "LMDB_Image"
    mod.LMDB_Image = LMDB_Image
    saved = sys.modules.get("__main__")
    sys.modules["__main__"] = mod
    try:
        return pickle.dumps(LMDB_Image(img, "v7"), protocol=2)
    finally:
        sys.modules["__main__"] = saved


def test_loads_lmdb_record_resolves_builder_main_class():
    from idvs.morec_tpu.data.imagestore import loads_lmdb_record

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(21, 17, 3), dtype=np.uint8)
    raw = _pickle_as_main_lmdb_image(img)
    np.testing.assert_array_equal(loads_lmdb_record(raw), img)


def test_lmdbstore_requires_lmdb_with_clear_error(tmp_path):
    try:
        import lmdb  # noqa: F401
        pytest.skip("lmdb installed — the positive round-trip test covers it")
    except ImportError:
        pass
    from idvs.morec_tpu.data.imagestore import LMDBStore

    with pytest.raises(ImportError, match="lmdb.*build_store_hm"):
        LMDBStore(str(tmp_path / "db"))


def test_lmdbstore_reads_reference_built_db(tmp_path):
    """Round-trips a genuine LMDB laid out exactly like
    dataset/HM/build_lmdb_hm.py:25-70 (pickled __main__.LMDB_Image records
    + __keys__/__len__ meta). Runs wherever the lmdb package exists."""
    lmdb = pytest.importorskip("lmdb")
    import pickle

    from idvs.morec_tpu.data.imagestore import LMDBStore, open_store

    rng = np.random.default_rng(6)
    imgs = {b"1": rng.integers(0, 256, size=(9, 9, 3), dtype=np.uint8),
            b"2": rng.integers(0, 256, size=(12, 7, 3), dtype=np.uint8)}
    path = str(tmp_path / "hm.lmdb")
    env = lmdb.open(path, subdir=False, map_size=1 << 20)
    with env.begin(write=True) as txn:
        for k, img in imgs.items():
            txn.put(k, _pickle_as_main_lmdb_image(img))
        txn.put(b"__keys__", pickle.dumps(list(imgs)))
        txn.put(b"__len__", pickle.dumps(len(imgs)))
    env.close()

    store = LMDBStore(path)
    for k, img in imgs.items():
        np.testing.assert_array_equal(store.get(k), img)
    assert isinstance(open_store(path), LMDBStore)
