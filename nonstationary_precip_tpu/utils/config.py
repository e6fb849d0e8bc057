"""Global configuration constants.

TPU-native analogue of the reference's ``utils/config.py``
(/root/reference/utils/config.py:10-20): the same numerical-policy
constants (jitter EPSILON, BASE_SEED) plus TPU device discovery in place
of ``torch.cuda`` counting.
"""

from pathlib import Path

import jax

#: Cholesky jitter added to kernel matrices (reference: EPSILON = 1e-5).
EPSILON = 1e-5

#: Base RNG seed shared by all experiments (reference: BASE_SEED = 173).
BASE_SEED = 173

BASE_PATH = Path(__file__).parent.parent.parent
RESULTS_DIR = BASE_PATH / "results"
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
