"""Hot compute ops with dual implementations.

Each op has a pure-jnp reference form (correctness oracle, runs anywhere)
and, where profitable, a Pallas TPU kernel in ``deepctr_tpu.ops.pallas``.
Dispatch is controlled by ``deepctr_tpu.config.set_use_pallas`` and defaults
to Pallas on TPU, jnp elsewhere.
"""

from .reference import (fm_cross_ref, cin_layer_ref, cin_mix_ref,
                        cross_net_ref, din_attention_ref)
from .dispatch import (fm_cross, cin_layer, cin_mix, cross_net,
                       din_attention)
