"""RFLayerGCN_remove: LayerGCN + unconditional RF (ablation, reference
`src/models/rflayergcn_remove.py`)."""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.models.layergcn import LayerGCN
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFLayerGCN_remove(RFHostMixin, LayerGCN):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.latent_dim)
        self._rf_condition_dim = 1

    def rf_host_repr(self, params, state):
        u, i = self.propagate(params, state["masked_vals"])
        return jnp.concatenate([u, i], axis=0)

    def rf_condition_feats(self, params):
        return [jnp.zeros((self.n_items, 1))]
