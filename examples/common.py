"""Shared helpers for the example drivers (equivalents of reference
examples 01-09, SURVEY.md §2.6).  Headless: outputs are written as OBJ /
NPZ under examples/output/ and summaries printed, replacing the reference's
OpenGL viewer."""

from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = pathlib.Path(__file__).resolve().parent / "output"
OUT.mkdir(exist_ok=True)


def out_path(name: str) -> pathlib.Path:
    return OUT / name


def write_obj(path, V, F=None):
    from surface_multigrid_code_tpu.utils.obj_io import write_obj as _w

    _w(path, V, F if F is not None else np.zeros((0, 3), dtype=np.int64))
    print(f"wrote {path}")
