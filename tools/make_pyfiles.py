"""Zip the engine package for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out: str = "engine.zip") -> str:
    out_path = os.path.join(ROOT, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for base, _dirs, files in os.walk(os.path.join(ROOT, "bella_domify_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(main())
