from .dims import build_dim, resolve_fk, null_safe_join
from .fill import forward_fill, forward_fill_expr
from .asof import asof_fill, asof_join

__all__ = [
    "build_dim",
    "resolve_fk",
    "null_safe_join",
    "forward_fill",
    "forward_fill_expr",
    "asof_fill",
    "asof_join",
]
