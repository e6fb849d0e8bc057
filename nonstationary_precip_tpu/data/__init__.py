from nonstationary_precip_tpu.data.dataprep import (  # noqa: F401
    load_csv,
    whitening_transform,
    box_cox_transform,
    prep_inputs,
    train_test_split,
    shuffle_split,
    sklearn_style_shuffle,
)
from nonstationary_precip_tpu.data.datasets import (  # noqa: F401
    load_uib_spatial,
    load_uib_spatio_temporal,
    load_khyber_time_series,
    spatio_temporal_month_split,
)
