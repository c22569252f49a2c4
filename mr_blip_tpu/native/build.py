"""Build the native video decoder shared library (lazy, cached)."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCE = os.path.join(_DIR, "video_decoder.cpp")
LIB = os.path.join(_DIR, "libvideodecoder.so")


def build(force: bool = False) -> str:
    if not force and os.path.exists(LIB) and (
        os.path.getmtime(LIB) >= os.path.getmtime(SOURCE)
    ):
        return LIB
    cflags = subprocess.check_output(
        ["pkg-config", "--cflags", "libavformat", "libavcodec", "libavutil",
         "libswscale"], text=True,
    ).split()
    libs = subprocess.check_output(
        ["pkg-config", "--libs", "libavformat", "libavcodec", "libavutil",
         "libswscale"], text=True,
    ).split()
    cmd = (
        ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", SOURCE, "-o", LIB]
        + cflags + libs
    )
    subprocess.check_call(cmd)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
