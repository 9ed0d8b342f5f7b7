from ssme_tpu.inference.pmmh import AdaptivePMMH, PMMHResult, PMMHState
from ssme_tpu.inference.swarm import SwarmFilter, SwarmResult

__all__ = ["AdaptivePMMH", "PMMHResult", "PMMHState", "SwarmFilter",
           "SwarmResult"]
