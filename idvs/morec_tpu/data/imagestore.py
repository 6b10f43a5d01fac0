"""Image record store + transform pipeline.

The reference stores PRE-DECODED uint8 HWC arrays in LMDB (LMDB_Image pickles
raw bytes + shape, inbatch_sasrec_e2e_vision/data_utils/dataset.py:16-25,
built offline by dataset/HM/build_lmdb_hm.py). This module provides:

- MKVStore: our own mmap'd single-file key-value store with the same content
  model (raw uint8 HWC records), since the lmdb package is not in this image.
  Layout: [MKV1 | u64 n | u64 index_off] [values...] [index: per entry
  u32 klen | key | u64 off | u64 size | u32 h | u32 w | u32 c].
- build_mkv_from_images / build_mkv_from_lmdb_layout: offline builders
  (the dataset/HM tooling equivalent).
- BatchTransform: batched resize-to-R + normalize((.5,.5,.5), (.5,.5,.5)),
  PIL-BILINEAR-compatible (torchvision transforms parity, dataset.py:68-73);
  native C++ (native/imagestore.cpp, ctypes) with a PIL fallback.
- LMDB compatibility: if the 'lmdb' package IS importable, LMDBStore reads
  the reference's original databases unchanged.
"""

from __future__ import annotations

import ctypes
import mmap
import os
import struct
import subprocess
from typing import Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

MAGIC = b"MKV1"
_HEADER = struct.Struct("<4sQQ")          # magic, n_entries, index_offset
_IDX_FIXED = struct.Struct("<QQIII")      # off, size, h, w, c


# ----------------------------------------------------------------- building
def write_mkv(path: str, records: Iterable[Tuple[bytes, np.ndarray]]) -> int:
    """records: (key, uint8 HWC array). Returns entry count."""
    index = []
    with open(path, "wb") as f:
        f.write(_HEADER.pack(MAGIC, 0, 0))
        for key, arr in records:
            arr = np.ascontiguousarray(arr, dtype=np.uint8)
            assert arr.ndim == 3, arr.shape
            off = f.tell()
            f.write(arr.tobytes())
            h, w, c = arr.shape
            index.append((key, off, arr.nbytes, h, w, c))
        index_off = f.tell()
        for key, off, size, h, w, c in index:
            f.write(struct.pack("<I", len(key)))
            f.write(key)
            f.write(_IDX_FIXED.pack(off, size, h, w, c))
        f.seek(0)
        f.write(_HEADER.pack(MAGIC, len(index), index_off))
    return len(index)


def build_mkv_from_images(image_dir: str, manifest_tsv: str, out_path: str,
                          log=None) -> Tuple[int, list]:
    """Offline JPEG dir + item TSV -> MKV store (the reference's
    dataset/HM/build_lmdb_hm.py:25-70 equivalent; keys are the item name
    without its leading letter, e.g. 'v123' -> b'123')."""
    from PIL import Image

    bad = []

    def gen():
        with open(manifest_tsv) as f:
            for line in f:
                name = line.strip("\n").split("\t")[0]
                key = name[1:].encode("ascii")
                img_path = os.path.join(image_dir, f"{name[1:]}.jpg")
                try:
                    arr = np.asarray(Image.open(img_path).convert("RGB"))
                except Exception:
                    bad.append(name)
                    continue
                yield key, arr

    n = write_mkv(out_path, gen())
    if log:
        log.info(f"MKV built: {n} entries, {len(bad)} bad files")
    return n, bad


# ------------------------------------------------------------------ reading
class MKVStore:
    """mmap'd reader; get() returns a zero-copy uint8 HWC view."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        magic, n, index_off = _HEADER.unpack_from(self._mm, 0)
        assert magic == MAGIC, f"not an MKV file: {path}"
        self.index: Dict[bytes, Tuple[int, int, int, int, int]] = {}
        pos = index_off
        for _ in range(n):
            (klen,) = struct.unpack_from("<I", self._mm, pos)
            pos += 4
            key = bytes(self._mm[pos:pos + klen])
            pos += klen
            off, size, h, w, c = _IDX_FIXED.unpack_from(self._mm, pos)
            pos += _IDX_FIXED.size
            self.index[key] = (off, size, h, w, c)

    def __len__(self):
        return len(self.index)

    def get(self, key: bytes) -> np.ndarray:
        off, size, h, w, c = self.index[key]
        return np.frombuffer(self._mm, np.uint8, count=size,
                             offset=off).reshape(h, w, c)

    def close(self):
        self._mm.close()
        self._f.close()


class CompatLMDBImage:
    """Field-compatible stand-in for the reference's LMDB_Image
    (inbatch_sasrec_e2e_vision/data_utils/dataset.py:16-25 and
    dataset/HM/build_lmdb_hm.py:13-22): channels, size, image (raw bytes)."""

    def get_image(self) -> np.ndarray:
        image = np.frombuffer(self.image, dtype=np.uint8)
        return image.reshape(*self.size, self.channels)


def loads_lmdb_record(raw: bytes) -> np.ndarray:
    """Unpickle one reference LMDB record -> (H, W, C) uint8.

    The reference pickles LMDB_Image instances from whatever module built
    the DB (running build_lmdb_hm.py as a script pickles them as
    '__main__.LMDB_Image'), so a plain pickle.loads cannot resolve the
    class here. Any class named LMDB_Image maps to the field-compatible
    CompatLMDBImage instead."""
    import io
    import pickle

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if name == "LMDB_Image":
                return CompatLMDBImage
            return super().find_class(module, name)

    return _Unpickler(io.BytesIO(raw)).load().get_image()


class LMDBStore:
    """Reads the reference's original LMDB databases (pickled LMDB_Image,
    built by dataset/HM/build_lmdb_hm.py:25-70), available only when the
    lmdb package is importable."""

    def __init__(self, path: str):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                f"reading the reference LMDB store at {path!r} requires the "
                f"'lmdb' package, which is not installed; either install "
                f"lmdb, or convert the store once with "
                f"tools/build_store_hm.py (MKV needs no extra packages)"
            ) from e
        self.env = lmdb.open(path, subdir=os.path.isdir(path), readonly=True,
                             lock=False, readahead=False, meminit=False)

    def get(self, key: bytes) -> np.ndarray:
        with self.env.begin() as txn:
            return loads_lmdb_record(txn.get(key))


def open_store(path: str):
    if path.endswith(".mkv") or (os.path.isfile(path) and
                                 open(path, "rb").read(4) == MAGIC):
        return MKVStore(path)
    return LMDBStore(path)


# --------------------------------------------------------------- transforms
_LIB = None


def _native_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB or None
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    so = os.path.join(here, "native", "libimagestore.so")
    src = os.path.join(here, "native", "imagestore.cpp")
    if not os.path.exists(so) and os.path.exists(src):
        try:
            subprocess.run(["make", "-C", os.path.dirname(src)], check=True,
                           capture_output=True)
        except Exception:
            _LIB = False
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.transform_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32]
        lib.transform_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32]
        _LIB = lib
        return lib
    except OSError:
        _LIB = False
        return None


class BatchTransform:
    """uint8 HWC images -> (N, R, R, 3) NHWC, TPU-native layout.

    mode='f32': normalized to [-1, 1] like torchvision Resize(R, BILINEAR) +
    ToTensor + Normalize(.5, .5) (reference dataset.py:68-73).
    mode='u8': resized uint8 only — 4x smaller host->device transfer; the
    (x/255 - .5)/.5 normalization runs on-device in the tower.
    """

    def __init__(self, resize: int, n_threads: Optional[int] = None,
                 force_python: bool = False, mode: str = "f32"):
        assert mode in ("f32", "u8")
        self.resize = resize
        self.mode = mode
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)
        self._lib = None if force_python else _native_lib()

    def __call__(self, images: Sequence[np.ndarray]) -> np.ndarray:
        n = len(images)
        r = self.resize
        dtype = np.float32 if self.mode == "f32" else np.uint8
        out = np.empty((n, r, r, 3), dtype)
        if self._lib is not None:
            ptrs = (ctypes.c_void_p * n)()
            hs = (ctypes.c_int32 * n)()
            ws = (ctypes.c_int32 * n)()
            cs = (ctypes.c_int32 * n)()
            keepalive = []
            for i, img in enumerate(images):
                img = np.ascontiguousarray(img, np.uint8)
                keepalive.append(img)
                ptrs[i] = img.ctypes.data
                hs[i], ws[i], cs[i] = img.shape
            if self.mode == "f32":
                self._lib.transform_batch(
                    ptrs, hs, ws, cs, n,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    r, self.n_threads)
            else:
                self._lib.transform_batch_u8(
                    ptrs, hs, ws, cs, n,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    r, self.n_threads)
            return out
        from PIL import Image
        for i, img in enumerate(images):
            pil = Image.fromarray(np.ascontiguousarray(img, np.uint8))
            pil = pil.convert("RGB").resize((r, r), Image.BILINEAR)
            if self.mode == "u8":
                out[i] = np.asarray(pil, np.uint8)
            else:
                arr = np.asarray(pil, np.float32) / 255.0
                out[i] = (arr - 0.5) / 0.5
        return out
