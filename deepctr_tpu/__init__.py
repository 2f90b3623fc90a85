"""DeepCTR-TPU: a TPU-native CTR/ranking framework built on JAX/XLA/Pallas.

Re-implements the full capability surface of DeepCTR-Torch (feature columns,
24 CTR models, Keras-style training engine) as an idiomatic JAX framework:
pure-functional models (flax.linen), optax optimizers, jit-compiled train
steps over `jax.sharding.Mesh` device meshes, and Pallas TPU kernels for the
hot interaction ops.

Reference capability surface: /root/reference/deepctr_torch (v0.2.9).
"""

from . import config
from .config import set_compute_dtype, compute_dtype, set_use_pallas
from .features import (SparseFeat, DenseFeat, VarLenSparseFeat,
                       build_input_features, get_feature_names,
                       DEFAULT_GROUP_NAME)
from .callbacks import History, EarlyStopping, ModelCheckpoint
from .utils.serialization import load_model, save_model
from . import layers
from . import models
from . import serving
from .data import criteo_stream, criteo_columns

__version__ = "0.1.0"

from .utils.version import check_version

check_version(__version__)   # no-op unless the env provides a latest
