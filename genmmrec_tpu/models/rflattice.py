"""RFLATTICE: LATTICE + RF enhancement (reference `src/models/rflattice.py`)."""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.models.lattice import LATTICE
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFLATTICE(RFHostMixin, LATTICE):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.embedding_dim)
        self._rf_condition_dim = 2 * self.feat_embed_dim

    def rf_host_repr(self, params, state):
        u, i = self.propagate(params)
        return jnp.concatenate([u, i], axis=0)

    def rf_condition_feats(self, params):
        img = self.v_feat @ params["image_trs"]["w"].T + params["image_trs"]["b"]
        txt = self.t_feat @ params["text_trs"]["w"].T + params["text_trs"]["b"]
        return [img, txt]
