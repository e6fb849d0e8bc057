"""Global configuration constants.

TPU-native analogue of the reference's ``utils/config.py``
(/root/reference/utils/config.py:10-20): the same numerical-policy
constants (jitter EPSILON, BASE_SEED) plus TPU device discovery in place
of ``torch.cuda`` counting.
"""

import os
from pathlib import Path

import jax

# GP linear algebra is precision-critical: with the TPU default, f32
# matmuls run through bf16 MXU passes (8-bit mantissa), which corrupts
# ||a||² + ||b||² − 2ab distance Grams enough to diverge training
# (validated 2026-08 on v5e: SE-ARD fit diverges at default precision,
# converges at 'highest'; CPU unaffected).  Override via
# NSGP_MATMUL_PRECISION=off|bfloat16|bfloat16_3x|highest.
_prec = os.environ.get("NSGP_MATMUL_PRECISION", "highest")
if _prec != "off":
    try:
        jax.config.update("jax_default_matmul_precision", _prec)
    except Exception:
        pass

#: Cholesky jitter added to kernel matrices (reference: EPSILON = 1e-5).
EPSILON = 1e-5

#: Base RNG seed shared by all experiments (reference: BASE_SEED = 173).
BASE_SEED = 173

BASE_PATH = Path(__file__).parent.parent.parent
#: Where experiment drivers write artifacts (CSV fields, figures).
#: Override with NSGP_RESULTS_DIR for smoke/verify runs so tiny-budget
#: drives don't clobber the shipped full-budget artifacts in results/.
RESULTS_DIR = Path(os.environ.get("NSGP_RESULTS_DIR", BASE_PATH / "results"))
DATASET_DIR = BASE_PATH / "data"


def tpu_devices():
    """All accelerator (non-CPU) devices visible to JAX."""
    return [d for d in jax.devices() if d.platform != "cpu"]


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU-like accelerator."""
    dev = jax.devices()[0]
    return dev.platform != "cpu"


def default_dtype():
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
