"""SSP decimation dispatcher (placeholder — implemented in milestone M2)."""

from __future__ import annotations

from surface_multigrid_code_tpu.config import DecimationType


def SSP_decimate(VO, FO, tarF, dec_type=DecimationType.MIDPOINT, seed=None):
    raise NotImplementedError("SSP_decimate lands in milestone M2")
