from nonstationary_precip_tpu.utils import config, struct  # noqa: F401
