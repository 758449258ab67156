from surface_multigrid_code_tpu.cli import main

main()
