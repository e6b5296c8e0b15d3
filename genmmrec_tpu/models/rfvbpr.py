"""RFVBPR: VBPR + RF enhancement (reference `src/models/rfvbpr.py`).

VBPR's user/item representations are 2·d wide (id ⊕ modal projection), so
the RF flow runs in 2·d; conditions = raw concatenated modal features.
"""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.models.rf_host import RFHostMixin
from genmmrec_tpu.models.vbpr import VBPR


class RFVBPR(RFHostMixin, VBPR):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, 2 * self.embedding_size)
        self._rf_condition_dim = self.feat_dim

    def rf_host_repr(self, params, state):
        return jnp.concatenate(
            [params["u_embedding"], self._item_embeddings(params)], axis=0
        )

    def rf_condition_feats(self, params):
        return [self.item_raw_features]
