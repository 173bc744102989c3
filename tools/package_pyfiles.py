"""Build the --py-files artifact: dist/mashspark.zip with the package at
the archive root, importable by executors' python workers.

Usage: python tools/package_pyfiles.py [out_zip]

Ship the job (north rule: "ships via spark-submit --py-files"):

    python tools/package_pyfiles.py
    spark-submit --py-files dist/mashspark.zip \
        tools/submit_dedup.py <input_parquet> <output_dir> \
        [--k 21] [--s 1000] [--threshold 0.7]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", "mashspark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    pkg = os.path.join(REPO, "mashspark")
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    arc = os.path.relpath(full, REPO)
                    zf.write(full, arc)
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
