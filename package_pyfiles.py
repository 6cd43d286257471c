"""Build dist/kgpipe.zip for spark-submit --py-files (north_rule: "launched
via spark-submit --py-files on a multi-executor cluster").

Usage:
    python package_pyfiles.py
    spark-submit --py-files dist/kgpipe.zip run_pipeline.py \
        --input <transcripts table dir> --output <graph table dir> \
        [--checkpoint-dir <run dir>] [--eval]

The zip contains only the package sources (no tests/fixcaches); executors
import ``kgpipe`` from it, the driver script stays a plain file argument.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def build(out: str = "dist/kgpipe.zip") -> str:
    out_path = os.path.join(REPO, out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "kgpipe")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
