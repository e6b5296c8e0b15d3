"""Offline preprocessing: raw ratings/meta → framework inputs.

Replaces the reference's notebook pipeline
(`GenMMRec/preprocessing/{0rating2inter,1splitting,2reindex-feat,
3feat-encoder}.ipynb` and `dualgnn-gen-u-u-matrix.py`) with a vectorized
CLI:

    python -m genmmrec_tpu.preprocessing rating2inter --ratings r.csv --out d/
    python -m genmmrec_tpu.preprocessing split --inter d/x-indexed.inter
    python -m genmmrec_tpu.preprocessing reindex-feat --meta meta.json.gz ...
    python -m genmmrec_tpu.preprocessing encode-feat --meta meta-x.csv ...
    python -m genmmrec_tpu.preprocessing uu-graph --dataset baby

Outputs match the reference's file contract (`preprocessing/README.md:14-27`):
`<ds>.inter` TSV (userID, itemID, rating, timestamp, x_label),
`image_feat.npy` / `text_feat.npy` (n_items, dim), and
`user_graph_dict.npy` (per-user top-200 co-occurrence neighbors).
"""

from genmmrec_tpu.preprocessing.pipeline import (
    kcore_filter,
    rating2inter,
    per_user_split,
    reindex_meta,
    encode_text_features,
    build_user_graph_dict,
)

__all__ = [
    "kcore_filter",
    "rating2inter",
    "per_user_split",
    "reindex_meta",
    "encode_text_features",
    "build_user_graph_dict",
]
