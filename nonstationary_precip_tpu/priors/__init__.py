from nonstationary_precip_tpu.priors.lognormal_process import LogNormalProcess  # noqa: F401
from nonstationary_precip_tpu.priors.matrix_normal import MatrixNormalPrior  # noqa: F401
from nonstationary_precip_tpu.priors.latent_gp import LatentGpPrior  # noqa: F401
