from surface_multigrid_code_tpu.ssp.decimate import SSP_decimate

__all__ = ["SSP_decimate"]
