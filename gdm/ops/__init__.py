from .tensor import (  # noqa: F401
    SeparableOperator,
    apply_banded,
    integrate_to_nodes,
    evaluate_at_quad,
    quad_points_1d,
)
