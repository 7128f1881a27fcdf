from .vtu import DataOut  # noqa: F401
from .tables import ConvergenceTable  # noqa: F401
