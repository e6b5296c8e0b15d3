"""RFCOHESION: COHESION + RF enhancement (reference `src/models/rfcohesion.py`).

COHESION's representation is 3·64 wide (id ⊕ visual ⊕ text segments)."""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.models.cohesion import COHESION
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFCOHESION(RFHostMixin, COHESION):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, 3 * self.dim_latent)
        self._rf_condition_dim = self.v_feat.shape[1] + self.t_feat.shape[1]

    def rf_host_repr(self, params, state):
        u, i = self.forward(params, state)
        return jnp.concatenate([u, i], axis=0)

    def rf_condition_feats(self, params):
        return [self.v_feat, self.t_feat]
