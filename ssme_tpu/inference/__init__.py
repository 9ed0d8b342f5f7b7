from ssme_tpu.inference.pmmh import AdaptivePMMH, PMMHResult, PMMHState
from ssme_tpu.inference.swarm import (SwarmFilter, SwarmResult,
                                      forecast_from_cloud)

__all__ = ["AdaptivePMMH", "PMMHResult", "PMMHState", "SwarmFilter",
           "SwarmResult", "forecast_from_cloud"]
