"""Loader for the optional native (C++) components in csrc/.

Build once with:
    cmake -S csrc -B csrc/build && cmake --build csrc/build -j

Python callers degrade gracefully to their pure-numpy paths when a library
hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SEARCH_DIRS = (
    os.path.join(_REPO_ROOT, "csrc", "build"),
    os.path.join(_REPO_ROOT, "build"),
    os.path.dirname(os.path.abspath(__file__)),
)


def load_library(name: str) -> Optional[ctypes.CDLL]:
    for d in _SEARCH_DIRS:
        for fname in (f"lib{name}.so", f"{name}.so"):
            path = os.path.join(d, fname)
            if os.path.isfile(path):
                return ctypes.CDLL(path)
    return None
