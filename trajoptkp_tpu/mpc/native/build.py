"""Build the native executor library (g++ -> libexecutor.so)."""

import os
import subprocess

_DIR = os.path.dirname(__file__)
LIB = os.path.join(_DIR, "libexecutor.so")
SRC = os.path.join(_DIR, "executor.cpp")


def build(force: bool = False) -> str:
    if force or not os.path.exists(LIB) or (
        os.path.getmtime(SRC) > os.path.getmtime(LIB)
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", LIB, SRC],
            check=True,
        )
    return LIB


if __name__ == "__main__":
    print(build(force=True))
