from ssme_tpu.ops.svol_kernel import (
    fused_svol_propagate_weight,
    pallas_available,
)

__all__ = ["fused_svol_propagate_weight", "pallas_available"]
