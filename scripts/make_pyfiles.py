#!/usr/bin/env python
"""Package the engine for ``spark-submit --py-files``.

Produces ``dist/win64_local_ocr_tool_spark.zip`` containing the package
(pure Python, no binary deps beyond the cluster's numpy/pandas/pyarrow),
importable from executors when shipped with --py-files.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "win64_local_ocr_tool_spark"
OUT = os.path.join(REPO, "dist", f"{PKG}.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
