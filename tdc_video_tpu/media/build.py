"""Build the native FFmpeg decoder (g++ -> libtdc_media.so), cached."""

from __future__ import annotations

import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "native", "decoder.cc")
LIB = os.path.join(_HERE, "native", "libtdc_media.so")

FLAGS = [
    "-O2",
    "-fPIC",
    "-shared",
    "-std=c++17",
    "-Wall",
    "-pthread",
]
LIBS = ["-lavformat", "-lavcodec", "-lswscale", "-lswresample", "-lavutil"]


def build(force: bool = False) -> str:
    """Compile if missing or stale; returns the .so path."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = ["g++", *FLAGS, SRC, "-o", LIB, *LIBS]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
