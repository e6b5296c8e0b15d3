"""RFBPR_remove: BPR + RF with modal conditions removed (ablation,
reference `src/models/rfbpr_remove.py`).

The reference passes an empty condition list (``generate([])``), which its
velocity net cannot actually consume; here the ablation is realized with a
constant zero condition channel so the flow is unconditional.
"""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.models.bpr import BPR
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFBPR_remove(RFHostMixin, BPR):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.embedding_size)
        self._rf_condition_dim = 1

    def rf_host_repr(self, params, state):
        return jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)

    def rf_condition_feats(self, params):
        return [jnp.zeros((self.n_items, 1))]
