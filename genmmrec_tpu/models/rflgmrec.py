"""RFLGMRec: LGMRec + RF enhancement (reference `src/models/rflgmrec.py`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genmmrec_tpu.models.lgmrec import LGMRec
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFLGMRec(RFHostMixin, LGMRec):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.embedding_dim)
        self._rf_condition_dim = 2 * self.feat_embed_dim

    def rf_host_repr(self, params, state):
        u, i, _ = self.forward(params, jax.random.PRNGKey(0))
        return jnp.concatenate([u, i], axis=0)

    def rf_condition_feats(self, params):
        return [
            self.v_feat @ params["item_image_trs"],
            self.t_feat @ params["item_text_trs"],
        ]
