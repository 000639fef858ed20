from graphqembed_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_mesh_2d,
    pad_table_rows,
    param_shardings,
    replicated,
    shard_params,
    table_sharding,
)
from graphqembed_tpu.parallel.train_step import (  # noqa: F401
    make_sharded_scan_train_step,
    make_sharded_train_step,
)
