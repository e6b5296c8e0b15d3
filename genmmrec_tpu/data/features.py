"""Pre-extracted multimodal item features (CLIP image / sentence-text).

Parity with the reference feature loading in ``GeneralRecommender.__init__``
(`src/common/abstract_recommender.py:89-103`): ``image_feat.npy`` /
``text_feat.npy`` are loaded once and placed on device; at least one modality
must exist for multimodal models. Synthetic fallback generates deterministic
features with realistic (unit-norm-ish, non-negative-mean) statistics.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def load_modal_features(
    config, n_items: int
) -> Tuple[
    Optional[jnp.ndarray], Optional[jnp.ndarray], Optional[np.ndarray], Optional[np.ndarray]
]:
    """Return (v_feat_dev, t_feat_dev, v_feat_host, t_feat_host), either
    loaded or synthesized."""
    if config["end2end"] or not config["is_multimodal_model"]:
        return None, None, None, None
    dataset_path = os.path.abspath(
        os.path.join(config["data_path"] or "./data/", config["dataset"] or "")
    )
    v_feat = t_feat = None
    v_path = os.path.join(dataset_path, config["vision_feature_file"] or "_")
    t_path = os.path.join(dataset_path, config["text_feature_file"] or "_")
    if os.path.isfile(v_path):
        v_feat = np.load(v_path, allow_pickle=True).astype(np.float32)
    if os.path.isfile(t_path):
        t_feat = np.load(t_path, allow_pickle=True).astype(np.float32)

    if v_feat is None and t_feat is None:
        if not config["synthetic_fallback"]:
            raise AssertionError("Features all NONE")
        import zlib

        # stable across processes (python's hash() is randomized per run)
        name_hash = zlib.crc32(str(config["dataset"]).encode())
        rng = np.random.default_rng(0xFEA7 ^ name_hash % (2**31))
        v_dim = int(config["synthetic_v_feat_dim"] or 4096)
        t_dim = int(config["synthetic_t_feat_dim"] or 384)
        # CLIP-like: mostly small positive activations
        v_feat = np.abs(rng.normal(0.0, 0.3, (n_items, v_dim))).astype(np.float32)
        t_feat = rng.normal(0.0, 0.5, (n_items, t_dim)).astype(np.float32)

    # return (device, host) pairs: ctor-time graph builders must read the
    # HOST copy — device→host downloads through the remote-attached-chip
    # tunnel run at ~3MB/s (sports-scale features are 300MB), while
    # host→device uploads run at >100MB/s
    to_dev = lambda x: jnp.asarray(x) if x is not None else None
    return to_dev(v_feat), to_dev(t_feat), v_feat, t_feat
