#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission.

    python scripts/make_pyfiles.py [out.zip]     # default dist/kms.zip
    spark-submit --py-files dist/kms.zip kernel_memory_spark/cli.py ...

The zip contains the pure-Python `kernel_memory_spark` package (no data
files, no native code), so executors import it straight from the zip —
the ship-shape the north rule's spark-submit deployment expects.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pkg_root = os.path.join(REPO, "kernel_memory_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "kms.zip")
    print(build(out))
