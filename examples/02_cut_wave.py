"""Cut-cell wave propagation on an embedded disk (the reference wave
app's flagship setup), with VTU output of the final state.

    python examples/02_cut_wave.py
"""

import jax

jax.config.update("jax_enable_x64", True)

from gdm.problems.wave import WaveProblem, make_preset

params = make_preset("wave", dim=2)
params.n_subdivisions_1D = 20   # keep the demo quick
params.end_t = 0.5
problem = WaveProblem(params, verbose=True)
problem.run()

from gdm.problems.wave import write_solution_vtu
from gdm.cut.geometry import INSIDE

write_solution_vtu(problem, "wave.vtu", INSIDE)
print("wrote wave.vtu (computed solution + analytical + level_set)")
