"""Build the native host-runtime library (libcartnative.so).

Usage: python cartslam_tpu/native/build.py
No external deps — plain g++ -O3 -shared.  The Python side
(cartslam_tpu/native/__init__.py) falls back to pure-Python
implementations when the library is absent.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = [os.path.join(HERE, "cluster.cpp")]
OUT = os.path.join(HERE, "libcartnative.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", OUT, *SRC,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
