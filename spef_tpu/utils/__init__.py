from spef_tpu.utils.metrics import AverageMeter, RunningAverage, mad  # noqa: F401
from spef_tpu.utils.experiment import (  # noqa: F401
    load_score_error,
    prepare_directories,
    save_score_error,
    set_seed,
)
