"""Store verification reader — reference dataset/HM/read_lmdb_hm.py
equivalent: iterate the built store once as a sanity check.

Usage: python tools/read_store_hm.py <store.mkv>
"""

import sys

from idvs.morec_tpu.data.imagestore import open_store


def main():
    store = open_store(sys.argv[1])
    n = 0
    for key in store.index:
        arr = store.get(key)
        assert arr.ndim == 3 and arr.dtype.kind == "u", (key, arr.shape)
        n += 1
    print(f"ok: {n} records verified")


if __name__ == "__main__":
    main()
