"""SSP map queries (placeholder — implemented in milestone M3)."""

from __future__ import annotations


def query_fine_to_coarse(dec_log, BC, BF, FIdx):
    raise NotImplementedError("query_fine_to_coarse lands in milestone M3")


def query_coarse_to_fine(dec_log, BC, BF, FIdx):
    raise NotImplementedError("query_coarse_to_fine lands in milestone M3")
