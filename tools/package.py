"""Build the --py-files artifact for spark-submit deployment.

Production launch shape (SURVEY.md §7 step 6):

    python tools/package.py /tmp/easyocr_spark.zip
    spark-submit --py-files /tmp/easyocr_spark.zip \
        --files craft_mlt_25k.pth,english_g2.pth \
        your_job.py

The zip carries only the package source (no tests/fixtures caches); it
is importable directly from the archive (zipimport), which is what
--py-files does on every executor's PYTHONPATH.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg_root = os.path.join(REPO, "easyocr_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                z.write(full, arc)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/easyocr_spark.zip"
    print(build(out))
