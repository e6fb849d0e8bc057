from nonstationary_precip_tpu.ops.linalg import (  # noqa: F401
    cholesky,
    safe_cholesky,
    tri_solve,
    cho_solve,
    solve_psd,
    mvn_logpdf_from_chol,
    robust_logdet,
    add_jitter,
    diag_part,
)
from nonstationary_precip_tpu.ops.bbmm import (  # noqa: F401
    cg_mll,
    lanczos_logdet,
    mbcg,
    pivoted_cholesky,
)
from nonstationary_precip_tpu.ops.lazy_cg import (  # noqa: F401
    lazy_cg_mll,
    lazy_cg_posterior,
    lazy_nystrom_factor,
    lazy_pivoted_cholesky,
)
from nonstationary_precip_tpu.ops.pallas_matvec import (  # noqa: F401
    gibbs_gram_matvec,
    rbf_gram_matvec,
    packed_gibbs_matvec_builder,
    stationary_matvec_builder,
)
from nonstationary_precip_tpu.ops.kmeans import kmeans_inducing_points  # noqa: F401
from nonstationary_precip_tpu.ops.pallas_chol import (  # noqa: F401
    chol_inv_batched_safe,
)
from nonstationary_precip_tpu.ops.pallas_elbo import fused_data_term  # noqa: F401
