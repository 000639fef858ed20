from graphqembed_tpu.training.eval import (  # noqa: F401
    auc_from_scores,
    eval_apr,
    eval_auc,
    percentile_ranks,
)
from graphqembed_tpu.training.device_data import (  # noqa: F401
    DeviceTrainData,
    make_scan_train_step,
    make_scan_train_step_sparse,
    run_train_device,
)
from graphqembed_tpu.training.metrics import (  # noqa: F401
    MetricsWriter,
    ThroughputMeter,
    setup_logging,
)
from graphqembed_tpu.training.sparse_adam import init_lazy_adam, lazy_adam_update  # noqa: F401
from graphqembed_tpu.training.loop import (  # noqa: F401
    TrainData,
    TrainResult,
    check_conv,
    make_train_step,
    run_train,
)
