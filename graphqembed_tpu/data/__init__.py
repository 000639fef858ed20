from graphqembed_tpu.data.queries import (  # noqa: F401
    Formula,
    Query,
    QueryBatch,
    STRUCT_SHAPE,
    make_batch,
)
from graphqembed_tpu.data.sampling import QuerySampler, answers, parallel_sample  # noqa: F401
