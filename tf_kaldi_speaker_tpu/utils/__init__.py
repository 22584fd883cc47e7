"""Config system, bookkeeping, summaries, fixtures."""

from .params import Params, ParamsPlain, remove_params_prefix
from .summary import SummaryWriter, load_scalars

__all__ = [
    "Params",
    "ParamsPlain",
    "SummaryWriter",
    "load_scalars",
    "remove_params_prefix",
]
