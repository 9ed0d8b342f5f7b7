from ssme_tpu.ops.svol_kernel import (
    fused_svol_propagate_weight,
    pallas_available,
)
from ssme_tpu.ops.svol_filter_kernel import (
    svol_filter_pallas,
    svol_pallas_batched_log_like,
    svol_pallas_replicated_log_like,
    svol_swarm_evidence_pallas,
)
from ssme_tpu.ops.svol_leverage_lw_kernel import (
    svol_leverage_lw_pallas,
    lw_cloud_params,
    lw_cloud_weights,
)
from ssme_tpu.ops.liu_west_megakernel import (
    LWKernelModel,
    lw_megakernel,
    svol_leverage_lw_kernel_model,
    svol_t_lw_kernel_model,
)

__all__ = [
    "LWKernelModel",
    "lw_megakernel",
    "svol_leverage_lw_kernel_model",
    "svol_t_lw_kernel_model",
    "fused_svol_propagate_weight",
    "pallas_available",
    "svol_filter_pallas",
    "svol_pallas_batched_log_like",
    "svol_pallas_replicated_log_like",
    "svol_swarm_evidence_pallas",
    "svol_leverage_lw_pallas",
    "lw_cloud_params",
    "lw_cloud_weights",
]
