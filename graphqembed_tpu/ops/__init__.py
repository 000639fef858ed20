from graphqembed_tpu.ops.kernels import (  # noqa: F401
    fused_intersection,
    fused_intersection_ref,
    gather_normalize,
    gather_normalize_ref,
    sddmm_scores,
    sddmm_scores_ref,
)
