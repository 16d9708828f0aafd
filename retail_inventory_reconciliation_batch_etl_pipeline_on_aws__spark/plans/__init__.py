from .stage_sales import stage_sales  # noqa: F401
from .build_dims import build_dim_products  # noqa: F401
from .reconcile import reconcile  # noqa: F401
