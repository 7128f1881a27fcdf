from .tensor import (  # noqa: F401
    SeparableOperator,
    apply_banded,
    integrate_to_nodes,
    evaluate_at_quad,
    quad_points_1d,
)
from .fast import laplace_apply_fn, mass_apply_fn  # noqa: F401
