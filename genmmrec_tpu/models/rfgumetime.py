"""RFGUMETime: temporal-augmentation RFGUME.

Parity with reference `rfgume_time.py:249-760` (despite the name it is not a
profiler — it is the temporal RF variant):
- interactions are split by timestamp; the earliest ``1 - temporal_ratio``
  fraction forms a *historical* UI graph, jointly normalized with the same
  common-KNN II edges as the full graph (``build_temporal_graphs`` /
  ``_build_adj_mat_from_inter``, :350-416);
- the RF velocity field learns a flow from h1 = conv(historical graph) to
  h2 = conv(full graph) instead of noise → target (:447-530): X0 = h1
  detached, X1 = h2 detached, conditions = explicit modal embeddings;
- with ``temporal_ratio == 0`` h1 falls back to Gaussian noise (:476-480),
  recovering plain RFGUME behavior;
- inference mixes convexly, ``(1-r)·h2 + r·generated`` after warmup
  (:578-592) — unlike RFGUME's additive residual.

TPU-native deltas: the historical adjacency is one boolean mask + the shared
host-side normalization (no scipy lil/dok assembly); timestamps ride in
``TrainData.times`` (the synthetic fallback uses file order as the
chronological surrogate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genmmrec_tpu.models.base import scalar
from genmmrec_tpu.models.rfgume import RFGUME


class RFGUMETime(RFGUME):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.temporal_ratio = scalar(config["temporal_ratio"] or 0.0)
        self.historical_adj = None
        if self.temporal_ratio > 0:
            users = np.asarray(data.users, np.int64)
            items = np.asarray(data.items, np.int64)
            if data.times is not None:
                times = np.asarray(data.times, np.float64)
            else:
                # chronological surrogate: interaction file order
                times = np.arange(len(users), dtype=np.float64)
            cutoff = np.quantile(times, 1.0 - self.temporal_ratio)
            hist_mask = times <= cutoff
            if hist_mask.sum() == 0:
                hist_mask[:] = True
            self.historical_adj, _ = self._augmented_adj_from(
                users[hist_mask], items[hist_mask]
            )

    # -- RF source: historical-graph embeddings instead of noise ---------
    def _rf_x0(self, params):
        if self.historical_adj is None:
            return None  # Gaussian source (rfgume_time.py:476-480)
        return self._conv_ui(
            self.historical_adj, params["user_embedding"], params["item_id_embedding"]
        )

    # -- convex inference mixing (rfgume_time.py:578-592) ----------------
    def _mix_eval(self, original, generated, warmed):
        r = warmed * self.rf_cfg.inference_mix_ratio
        return (1.0 - r) * original + r * generated
