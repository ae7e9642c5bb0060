"""On-demand build of the native bamio library.

Compiles ``csrc/bamio.cpp`` into a shared object next to this module the
first time it is needed (or when the source is newer than the cached .so).
"""

from __future__ import annotations

import subprocess
from pathlib import Path

_SRC = Path(__file__).parent / "csrc" / "bamio.cpp"
_SO = Path(__file__).parent / "_bamio.so"


def build_bamio(force: bool = False) -> Path:
    if not force and _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_SO), "-lz",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"bamio build failed:\n{proc.stderr}")
    return _SO
