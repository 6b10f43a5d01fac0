"""Offline image-store builder — reference dataset/HM/build_lmdb_hm.py:25-70
equivalent. JPEG directory + item TSV -> MKV record store (raw uint8 HWC
arrays, same content model as the reference's pickled LMDB_Image records).

Usage: python tools/build_store_hm.py <image_dir> <items_tsv> <out.mkv>
"""

import sys

from idvs.morec_tpu.data.imagestore import build_mkv_from_images


def main():
    image_dir, items_tsv, out_path = sys.argv[1:4]
    n, bad = build_mkv_from_images(image_dir, items_tsv, out_path)
    print(f"built {out_path}: {n} entries")
    if bad:
        print(f"bad files ({len(bad)}):")
        for name in bad:
            print(" ", name)


if __name__ == "__main__":
    main()
