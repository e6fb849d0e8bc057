from nonstationary_precip_tpu.kernels.base import Kernel, Sum, Product, Scale  # noqa: F401
from nonstationary_precip_tpu.kernels.stationary import RBF, Periodic, Matern52  # noqa: F401
from nonstationary_precip_tpu.kernels.gibbs import (  # noqa: F401
    GibbsKernel,
    gibbs_gram,
    gibbs_diag,
)
from nonstationary_precip_tpu.kernels.multivariate_gibbs import (  # noqa: F401
    MultivariateGibbsKernel,
    paciorek_schervish_gram_2d,
)
from nonstationary_precip_tpu.kernels.inducing import (  # noqa: F401
    nystrom_root,
    sgpr_diag_correction,
)
