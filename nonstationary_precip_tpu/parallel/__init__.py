from nonstationary_precip_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    make_mesh_2d,
)
from nonstationary_precip_tpu.parallel.dp import (  # noqa: F401
    dp_value_and_grad,
    pad_to_multiple,
    shard_batch,
)
from nonstationary_precip_tpu.parallel.distributed_chol import (  # noqa: F401
    sharded_cholesky,
    sharded_cholesky_2d,
    sharded_mvn_logpdf,
)
from nonstationary_precip_tpu.parallel.sharded_cg import (  # noqa: F401
    make_sharded_chunked_mll,
    sharded_cg_mll,
    sharded_cg_posterior,
    sharded_posterior_query,
    sharded_posterior_state,
)
from nonstationary_precip_tpu.parallel.sharded_predict import sharded_marginals  # noqa: F401
from nonstationary_precip_tpu.parallel.sharded_sgpr import (  # noqa: F401
    sharded_sgpr_loss,
    sharded_sgpr_value_and_grad,
)
