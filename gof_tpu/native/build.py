"""Build the native IO library: python -m gof_tpu.native.build"""

import os
import subprocess
import sys


def build():
    here = os.path.dirname(__file__)
    src = os.path.join(here, "colmap_io.cpp")
    out = os.path.join(here, "libgof_io.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
