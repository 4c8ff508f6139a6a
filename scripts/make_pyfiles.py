#!/usr/bin/env python
"""Build dist/uncharted_ta1_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    dist = os.path.join(HERE, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "uncharted_ta1_spark.zip")
    pkg = os.path.join(HERE, "uncharted_ta1_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    fp = os.path.join(root, f)
                    z.write(fp, os.path.relpath(fp, HERE))
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
