from graphqembed_tpu.models.params import init_params, params_to_numpy  # noqa: F401
from graphqembed_tpu.models.encoders import (  # noqa: F401
    NeighborTables,
    init_encoder_params,
    sage_encode,
)
from graphqembed_tpu.models.gqe import (  # noqa: F401
    embed_query,
    encode,
    forward_scores,
    intersect,
    l2_normalize,
    margin_loss,
    project,
    score,
)
