"""Example 02 — full multigrid hierarchy (reference 02_mg_hierarchy/main.cpp).

mg_precompute on bunny with the reference defaults (ratio 0.25, coarsest
> 500 vertices, midpoint decimation); writes each level and the prolonged
coarse vertices P_l @ V_l (what the reference renders as overlay points).
"""

from common import out_path, write_obj
from surface_multigrid_code_tpu.solver.hierarchy import mg_precompute
from surface_multigrid_code_tpu.utils.obj_io import read_obj
from surface_multigrid_code_tpu.utils.paths import mesh_path


def main():
    V, F = read_obj(mesh_path("bunny"))
    print(f"original mesh: |V| {V.shape[0]}, |F|: {F.shape[0]}")
    mg = mg_precompute(V, F, ratio=0.25, min_coarsest_nv=500, dec_type=1)
    for lv in range(len(mg)):
        write_obj(out_path(f"ex02_level{lv}.obj"), mg[lv].V, mg[lv].F)
        if lv > 0:
            pts = mg[lv].P_full @ mg[lv].V  # on the previous level's surface
            write_obj(out_path(f"ex02_level{lv}_prolonged.obj"), pts)


if __name__ == "__main__":
    main()
