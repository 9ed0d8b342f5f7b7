from ssme_tpu.models.base import StateSpaceModel
from ssme_tpu.models import svol
from ssme_tpu.models import svol_leverage
from ssme_tpu.models import lgssm
from ssme_tpu.models import factor_svol
from ssme_tpu.models import poisson_ar
from ssme_tpu.models import svol_t

__all__ = ["StateSpaceModel", "svol", "svol_leverage", "lgssm",
           "poisson_ar", "svol_t",
           "factor_svol"]
