from nonstationary_precip_tpu.train.metrics import (  # noqa: F401
    rmse_rescaled,
    rmse_raw,
    nlpd_joint,
    nlpd_marginal,
)
from nonstationary_precip_tpu.train.optim import fit, adam_scan, TrainResult  # noqa: F401
