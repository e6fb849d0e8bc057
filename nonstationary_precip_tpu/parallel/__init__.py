from nonstationary_precip_tpu.parallel.mesh import make_mesh, data_sharding  # noqa: F401
from nonstationary_precip_tpu.parallel.dp import (  # noqa: F401
    dp_value_and_grad,
    pad_to_multiple,
    shard_batch,
)
from nonstationary_precip_tpu.parallel.distributed_chol import (  # noqa: F401
    sharded_cholesky,
    sharded_mvn_logpdf,
)
from nonstationary_precip_tpu.parallel.sharded_predict import sharded_marginals  # noqa: F401
from nonstationary_precip_tpu.parallel.sharded_sgpr import (  # noqa: F401
    sharded_sgpr_loss,
    sharded_sgpr_value_and_grad,
)
