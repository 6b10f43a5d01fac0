"""Build-then-verify driver — reference dataset/HM/run_lmdb_hm.py equivalent.

Usage: python tools/run_store_hm.py <image_dir> <items_tsv> <out.mkv>
"""

import subprocess
import sys


def main():
    image_dir, items_tsv, out_path = sys.argv[1:4]
    subprocess.run([sys.executable, "tools/build_store_hm.py",
                    image_dir, items_tsv, out_path], check=True)
    subprocess.run([sys.executable, "tools/read_store_hm.py", out_path],
                   check=True)


if __name__ == "__main__":
    main()
