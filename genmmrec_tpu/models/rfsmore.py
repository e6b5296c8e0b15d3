"""RFSMORE: SMORE + RF enhancement (reference `src/models/rfsmore.py`)."""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.models.rf_host import RFHostMixin
from genmmrec_tpu.models.smore import SMORE


class RFSMORE(RFHostMixin, SMORE):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.embedding_dim)
        self._rf_condition_dim = 2 * self.embedding_dim

    def rf_host_repr(self, params, state):
        u, i = self.forward(params)
        return jnp.concatenate([u, i], axis=0)

    def rf_condition_feats(self, params):
        return [
            self._lin(params["image_trs"], self.v_feat),
            self._lin(params["text_trs"], self.t_feat),
        ]
