"""RFFREEDOM: FREEDOM + RF enhancement (reference `src/models/rffreedom.py`).

Target = FREEDOM's full-graph propagated representation; conditions =
projected image/text raw features.
"""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.common.init import apply_linear
from genmmrec_tpu.models.freedom import FREEDOM
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFFREEDOM(RFHostMixin, FREEDOM):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.embedding_dim)
        self._rf_condition_dim = 2 * self.feat_embed_dim

    def rf_host_repr(self, params, state):
        u, i = self.propagate(params, self._full_norm_vals())
        return jnp.concatenate([u, i], axis=0)

    def rf_condition_feats(self, params):
        return [
            apply_linear(params["image_trs"], self.v_feat),
            apply_linear(params["text_trs"], self.t_feat),
        ]
