"""Sod shock tube: run to t=0.2 and dump the 1D density/pressure profile.

    python examples/sod_profile.py
    gnuplot -p -e "plot 'sod_X_slice' u 1:3 w l t 'rho', '' u 1:6 w l t 'p'"
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from armon_tpu import ArmonParameters, armon

params = ArmonParameters(
    test="Sod", N=(400, 400), data_type="float32",
    write_slices=True, output_file="sod", silent=1, check_result=True,
)
stats = armon(params)
print(stats)
print("profiles written: sod_X_slice / sod_Y_slice / sod_D_slice")
