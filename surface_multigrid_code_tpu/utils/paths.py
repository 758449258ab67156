"""Repo-relative data paths (bundled test meshes)."""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
MESH_DIR = os.path.join(_REPO_ROOT, "data", "meshes")
CACHE_DIR = os.path.join(_REPO_ROOT, "data", "cache")


def mesh_path(name: str) -> str:
    if not name.endswith(".obj"):
        name += ".obj"
    return os.path.join(MESH_DIR, name)
