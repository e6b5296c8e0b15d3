"""RFPGL: PGL + RF enhancement (reference `src/models/rfpgl.py`).

PGL's representation is 2·feat_embed_dim wide (modal concat)."""

from __future__ import annotations

import jax.numpy as jnp

from genmmrec_tpu.models.pgl import PGL
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFPGL(RFHostMixin, PGL):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, 2 * self.feat_embed_dim)
        self._rf_condition_dim = self.v_feat.shape[1] + self.t_feat.shape[1]

    def rf_host_repr(self, params, state):
        from genmmrec_tpu.ops.graph import SparseGraph

        N = self.n_users + self.n_items
        full = SparseGraph(
            rows=self.adj_rows, cols=self.adj_cols, vals=self._full_vals(),
            n_rows=N, n_cols=N,
            pallas_span=self._pspan, symmetric=True,
        )
        u, i = self.forward(params, full)
        return jnp.concatenate([u, i], axis=0)

    def rf_condition_feats(self, params):
        return [self.v_feat, self.t_feat]
