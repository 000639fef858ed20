from graphqembed_tpu.training.eval import (  # noqa: F401
    auc_from_scores,
    eval_apr,
    eval_auc,
    percentile_ranks,
)
from graphqembed_tpu.training.loop import (  # noqa: F401
    TrainData,
    TrainResult,
    check_conv,
    make_train_step,
    run_train,
)
