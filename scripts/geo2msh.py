"""Gmsh .geo -> .msh mesh-generation driver.

Analogue of the reference's data/geo2msh.jl (which drives the Gmsh C++
library).  Gmsh is not bundled in this environment; this script shells out to
a `gmsh` binary when one is available on PATH and gives a clear error
otherwise.

Usage:  python scripts/geo2msh.py input.geo [output.msh] [--dim 3]
"""

from __future__ import annotations

import shutil
import subprocess
import sys


def geo_to_msh(input_path, output_path=None, dim=3):
    if output_path is None:
        base = input_path[:-4] if input_path.endswith(".geo") else input_path
        output_path = base + ".msh"
    gmsh = shutil.which("gmsh")
    if gmsh is None:
        raise RuntimeError(
            "gmsh binary not found on PATH. Install Gmsh or generate the "
            ".msh elsewhere; easysimp_tpu.import_mesh reads .msh v2.2/v4.1."
        )
    subprocess.run(
        [gmsh, f"-{int(dim)}", input_path, "-o", output_path, "-format",
         "msh41"],
        check=True,
    )
    return output_path


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dim = 3
    if "--dim" in sys.argv:
        dim = int(sys.argv[sys.argv.index("--dim") + 1])
    print(geo_to_msh(*args[:2], dim=dim))
