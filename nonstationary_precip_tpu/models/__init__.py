from nonstationary_precip_tpu.models.likelihoods import GaussianLikelihood  # noqa: F401
from nonstationary_precip_tpu.models.distributions import DiagNormal, MVN  # noqa: F401
from nonstationary_precip_tpu.models.exact_gp import ExactGP  # noqa: F401
from nonstationary_precip_tpu.models.gibbs_gp import GibbsExactGP, GibbsSparseGP  # noqa: F401
from nonstationary_precip_tpu.models.spatio_temporal import (  # noqa: F401
    SpatioTemporalStationary,
    SparseSpatioTemporalNonstationary,
)
from nonstationary_precip_tpu.models.sgpr import SGPR  # noqa: F401
from nonstationary_precip_tpu.models.svgp import SVGPLayer  # noqa: F401
from nonstationary_precip_tpu.models.deep_gp import DeepGP  # noqa: F401
from nonstationary_precip_tpu.models.multivariate_gibbs_gp import (  # noqa: F401
    MultivariateGibbsGP,
    SparseMultivariateGibbsGP,
)
