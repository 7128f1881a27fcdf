"""Cut-cell wave propagation on an embedded disk (the reference wave
app's flagship setup), with VTU output of the final state.

    python examples/02_cut_wave.py
"""

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

from gdm.problems.wave import WaveProblem, make_preset
from gdm.io import DataOut
from gdm.cut.geometry import OUTSIDE

params = make_preset("wave", dim=2)
params.n_subdivisions_1D = 20   # keep the demo quick
params.end_t = 0.5
problem = WaveProblem(params, verbose=True)
problem.run()

u = problem.interpolate_exact(params.end_t)
out = DataOut(problem.grid, params.output_fe_degree)
out.add_data_vector(np.asarray(u), "analytical_solution")
out.add_cell_data(np.zeros(problem.grid.n_cells), "ranks")
out.set_cell_selection(problem.geo.locations_flat != OUTSIDE)
out.write_vtu("wave.vtu")
print("wrote wave.vtu")
