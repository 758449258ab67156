"""Example 09 — randomized subdivision remeshing
(reference 09_random_subdiv_remesh/main.cpp).

CLI: python ex09_random_subdiv_remesh.py [mesh] [tarF] [nsubdiv] [seed]
(reference argv parsing :238-251).  Random-qslim decimation (pop a uniform
edge among the top 1+rand()%100 heap entries), neuralSubdiv-compatible
midpoint-upsample connectivity, coarse->fine query, writes
output_s{0..nsubdiv}.obj.
"""

import sys

from common import out_path
from ex08_subdiv_remesh import main as remesh


if __name__ == "__main__":
    if len(sys.argv) == 5:
        mesh, tarF, nsub, seed = (
            sys.argv[1],
            int(sys.argv[2]),
            int(sys.argv[3]),
            int(sys.argv[4]),
        )
    elif len(sys.argv) == 1:
        # reference 09_random_subdiv_remesh commits output_s0..s3 (its
        # main.cpp:288 was run with 3 subdivisions) - match that depth
        mesh, tarF, nsub, seed = "bunny", 500, 3, 10
    else:
        raise SystemExit(
            "usage: ex09_random_subdiv_remesh.py [mesh] [tarF] [nsubdiv] [seed]"
        )
    remesh(mesh=mesh, tarF=tarF, num_subdivs=nsub, dec_type=0, seed=seed, tag="ex09")
