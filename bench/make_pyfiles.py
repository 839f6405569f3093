#!/usr/bin/env python
"""Build engine.zip for spark-submit --py-files."""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(dest: str | None = None) -> str:
    dest = dest or str(REPO / "dist" / "engine.zip")
    Path(dest).parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "engine").glob("*.py")):
            zf.write(py, f"engine/{py.name}")
    return dest


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
