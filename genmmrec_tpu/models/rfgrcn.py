"""RFGRCN: GRCN + RF enhancement (reference `src/models/rfgrcn.py`).

GRCN's final representation is dim_x + 2·dim_C wide (id ⊕ content concat)."""

from __future__ import annotations

from genmmrec_tpu.models.grcn import GRCN
from genmmrec_tpu.models.rf_host import RFHostMixin


class RFGRCN(RFHostMixin, GRCN):
    def __init__(self, config, data):
        super().__init__(config, data)
        self._rf_setup(config, self.dim_x + 2 * self.dim_C)
        self._rf_condition_dim = self.v_feat.shape[1] + self.t_feat.shape[1]

    def rf_host_repr(self, params, state):
        return self.forward(params)

    def rf_condition_feats(self, params):
        return [self.v_feat, self.t_feat]
