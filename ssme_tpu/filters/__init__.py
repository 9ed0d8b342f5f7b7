from ssme_tpu.filters.bootstrap import (
    BootstrapFilter,
    FilterResult,
    log_likelihood_fn,
    replicated_log_like_fn,
)
from ssme_tpu.filters.liu_west import LiuWestFilter, LiuWestResult
from ssme_tpu.filters.auxiliary import AuxiliaryParticleFilter
from ssme_tpu.filters.smoothing import fixed_lag_smoother

__all__ = [
    "BootstrapFilter",
    "FilterResult",
    "log_likelihood_fn",
    "replicated_log_like_fn",
    "LiuWestFilter",
    "LiuWestResult",
    "AuxiliaryParticleFilter",
    "fixed_lag_smoother",
]
