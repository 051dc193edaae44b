"""Sedov blast wave with animation frames (gnuplot pm3d compatible).

    python examples/sedov_animation.py
    gnuplot -e "set pm3d map; splot 'anim/sedov_010' u 1:2:3" -p
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from armon_tpu import ArmonParameters, armon

params = ArmonParameters(
    test="Sedov", N=(500, 500), data_type="float32",
    maxcycle=600, animation_step=50,
    write_output=True, output_file="sedov", silent=2,
)
stats = armon(params)
print(stats)
print("frames under ./anim/, final state in ./sedov")
