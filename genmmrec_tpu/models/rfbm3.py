"""RFBM3: BM3 + Rectified-Flow enhancement (reference `src/models/rfbm3.py:17-305`).

Target = BM3's propagated (user ; item) representation; conditions =
projected image/text features lifted to users via the interaction matrix
(the reference falls back to zeros for the user side when R is absent —
here R is always available).
"""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.common.init import apply_linear
from genmmrec_tpu.models.bm3 import BM3
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFBM3(RFHostMixin, BM3):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.embedding_dim)
        self._rf_condition_dim = 2 * self.feat_embed_dim

    def rf_host_repr(self, params, state):
        u, i = self.propagate(params)
        return jnp.concatenate([u, i], axis=0)

    def rf_condition_feats(self, params):
        return [
            apply_linear(params["image_trs"], params["image_embedding"]),
            apply_linear(params["text_trs"], params["text_embedding"]),
        ]
