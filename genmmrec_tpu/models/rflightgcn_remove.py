"""RFLightGCN_remove: LightGCN + unconditional RF (ablation, reference
`src/models/rflightgcn_remove.py`). See rfbpr_remove for the
zero-condition note."""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.models.lightgcn import LightGCN
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFLightGCN_remove(RFHostMixin, LightGCN):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.latent_dim)
        self._rf_condition_dim = 1

    def rf_host_repr(self, params, state):
        u, i = self.propagate(params)
        return jnp.concatenate([u, i], axis=0)

    def rf_condition_feats(self, params):
        return [jnp.zeros((self.n_items, 1))]
