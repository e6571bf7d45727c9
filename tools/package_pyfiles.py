"""Build the --py-files zip for spark-submit (north_rule launch shape:
``spark-submit --py-files engine.zip job.py --mode officeAction ...``).

Usage:
    python tools/package_pyfiles.py [out.zip]     # default: dist/engine.zip
Smoke test:
    spark-submit --py-files dist/engine.zip \
      -- $(python -c 'import patent_decision_document_converter_spark...') see README
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "patent_decision_document_converter_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "engine.zip")
    print(build(out))
