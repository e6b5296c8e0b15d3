"""Multimodal interest clustering + interest-debiased generation filtering.

Parity with reference `src/common/interest_cluster.py:17-383`:
- ``MultimodalCluster``: per-modality KMeans over standardized item features
  with per-dataset optimal k (baby: image 6 / text 11; sports: 9 / 12;
  defaults 18 / 59), optional auto-k via inertia second differences, and a
  spectral fusion clustering variant;
- ``InterestDebiase``: of the entries the generator flipped, a
  ``sample_ratio`` subset is re-examined — 0→1 flips survive only if the
  item's cluster is in the user's interacted-cluster set (image OR text);
  1→0 flips are accepted only when the user's frequency for that cluster is
  ≤ min_freq+1 (rare-cluster interactions treated as accidental clicks).

TPU-native deltas: clustering runs once on host at trainer init (sklearn);
the debias *decision tables* are precomputed as dense per-user boolean /
count arrays so the per-batch filtering (reference: Python loops over
sampled pairs, `interest_cluster.py:240-331`) is a fully vectorized jnp
transform over the (B, n_items) generated matrix.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# per-dataset optimal cluster counts (reference trainer.py:632-648)
OPTIMAL_K = {
    "tiktok": {"image": 18, "text": 59, "audio": 46},
    "baby": {"image": 6, "text": 11},
    "sports": {"image": 9, "text": 12},
}
DEFAULT_K = {"image": 18, "text": 59, "audio": 46}


# ----------------------------------------------------------------------
# Device k-means (Lloyd + k-means++ D² seeding). The reference clusters with
# sklearn on host (`src/common/interest_cluster.py:78`); at elec scale
# (63001 x 4096, k=18, n_init=10) that is hours on one CPU core while the
# same computation is seconds of MXU matmuls — this was the entire
# GenRecV1-at-elec timeout in round 3. Semantics match sklearn KMeans
# (k-means++ init, Lloyd iterations, best-inertia over n_init restarts);
# the reference's KMeans() has no fixed random_state, so parity is
# distributional, not bitwise.
from functools import partial


@partial(jax.jit, static_argnames=("k", "max_iter"))
def _kmeans_single(key, x, k: int, max_iter: int = 100, tol: float = 1e-4):
    n = x.shape[0]
    x_sq = (x * x).sum(-1)
    hi = jax.lax.Precision.HIGHEST

    def dist2(centers):
        cross = jnp.dot(x, centers.T, precision=hi)
        c_sq = (centers * centers).sum(-1)
        return jnp.maximum(x_sq[:, None] - 2.0 * cross + c_sq[None, :], 0.0)

    # k-means++ (plain D² sampling)
    k_first, k_loop = jax.random.split(key)
    first = jax.random.randint(k_first, (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])
    mind0 = ((x - x[first]) ** 2).sum(-1)

    def seed_body(i, carry):
        centers, mind, kk = carry
        kk, k_sel = jax.random.split(kk)
        probs = mind / jnp.maximum(mind.sum(), 1e-12)
        idx = jax.random.choice(k_sel, n, p=probs)
        c = x[idx]
        centers = centers.at[i].set(c)
        mind = jnp.minimum(mind, ((x - c) ** 2).sum(-1))
        return centers, mind, kk

    centers, _, _ = jax.lax.fori_loop(1, k, seed_body, (centers0, mind0, k_loop))

    def cond(carry):
        _, shift, it = carry
        return jnp.logical_and(it < max_iter, shift > tol)

    def body(carry):
        centers, _, it = carry
        labels = jnp.argmin(dist2(centers), axis=1)
        counts = jax.ops.segment_sum(jnp.ones((n,), x.dtype), labels, num_segments=k)
        sums = jax.ops.segment_sum(x, labels, num_segments=k)
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        shift = ((new - centers) ** 2).sum()
        return new, shift, it + 1

    centers, _, _ = jax.lax.while_loop(cond, body, (centers, jnp.inf, 0))
    d = dist2(centers)
    labels = jnp.argmin(d, axis=1)
    inertia = jnp.take_along_axis(d, labels[:, None], axis=1).sum()
    return labels, inertia


def kmeans_fit(
    features: np.ndarray, k: int, n_init: int = 10, seed: int = 0, max_iter: int = 100
):
    """Best-of-``n_init`` device k-means; returns (labels, inertia) on host."""
    x = jnp.asarray(np.asarray(features, np.float32))
    best_labels, best_inertia = None, np.inf
    for i in range(n_init):
        labels, inertia = _kmeans_single(
            jax.random.PRNGKey(seed * 1000003 + i), x, k=int(k), max_iter=max_iter
        )
        inertia = float(inertia)
        if inertia < best_inertia:
            best_labels, best_inertia = np.asarray(labels), inertia
    return best_labels, best_inertia


class MultimodalCluster:
    def __init__(
        self,
        kmeans_cluster_num: int = 20,
        spectral_cluster_num: int = 20,
        sim_top_k: int = 20,
        use_auto_optimal_k: bool = False,
        kmeans_cluster_num_min: int = 3,
        kmeans_cluster_num_max: int = 237,
        kmeans_stride: int = 10,
        seed: int = 0,
    ):
        self.kmeans_cluster_num = kmeans_cluster_num
        self.spectral_cluster_num = spectral_cluster_num
        self.sim_top_k = sim_top_k
        self.use_auto_optimal_k = use_auto_optimal_k
        self.k_min = kmeans_cluster_num_min
        self.k_max = kmeans_cluster_num_max
        self.stride = kmeans_stride
        self.seed = seed

    def _standardize(self, feats: np.ndarray) -> np.ndarray:
        mu = feats.mean(axis=0, keepdims=True)
        sd = feats.std(axis=0, keepdims=True)
        return (feats - mu) / np.maximum(sd, 1e-12)

    def multimodal_specific_cluster(
        self, features, modality: str, optimal_cluster_num: int
    ) -> np.ndarray:
        feats = self._standardize(np.asarray(features, np.float64)).astype(np.float32)
        k = (
            self.get_kmeans_cluster_optimal_num(feats)
            if self.use_auto_optimal_k
            else optimal_cluster_num
        )
        k = max(2, min(int(k), feats.shape[0]))
        labels, _ = kmeans_fit(feats, k, n_init=10, seed=self.seed)
        return labels

    def get_kmeans_cluster_optimal_num(self, feats: np.ndarray) -> int:
        """Inertia second-difference auto-k. NOTE: the reference imports
        sklearn's silhouette_score but never calls it
        (`src/common/interest_cluster.py:13` is an unused import); its
        actual selection rule is argmin of np.diff(np.diff(inertias))
        (:82-105) — reproduced here exactly, with the k-grid fits on
        device."""
        distortions = []
        for i in range(self.k_min, min(self.k_max, feats.shape[0]), self.stride):
            # n_init=10 matches sklearn's default; fewer restarts leave
            # enough inertia noise in the flat tail to flip the brittle
            # second-difference argmin the reference rule uses
            _, inertia = kmeans_fit(feats, i, n_init=10, seed=self.seed)
            distortions.append(inertia)
        diff2 = np.diff(np.diff(distortions))
        return int(np.argmin(diff2)) + self.k_min + 1

    def multimodal_fusion_cluster(self, fusion_feats) -> np.ndarray:
        from sklearn.cluster import SpectralClustering

        f = np.asarray(fusion_feats, np.float64)
        fn = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        sim = fn @ fn.T
        n = sim.shape[0]
        for i in range(n):  # keep top-k per row (reference sparsification)
            idx = np.argpartition(sim[i], -self.sim_top_k)[-self.sim_top_k :]
            mask = np.ones(n, bool)
            mask[idx] = False
            sim[i, mask] = 0
        sim = np.maximum(sim, sim.T)
        k = min(self.spectral_cluster_num, n - 1)
        return SpectralClustering(
            n_clusters=k, affinity="precomputed", random_state=self.seed
        ).fit_predict(sim)


# ----------------------------------------------------------------------
def build_debias_tables(
    train_users: np.ndarray,
    train_items: np.ndarray,
    n_users: int,
    image_labels: np.ndarray,
    text_labels: np.ndarray,
):
    """Precompute per-user cluster membership/counts for vectorized debias.

    Returns a dict of device arrays:
      img_member (U, Ki) bool, txt_member (U, Kt) bool,
      txt_counts (U, Kt) float, txt_minfreq (U,) float,
      img_labels (I,), txt_labels (I,)
    """
    Ki = int(image_labels.max()) + 1
    Kt = int(text_labels.max()) + 1
    img_member = np.zeros((n_users, Ki), bool)
    txt_member = np.zeros((n_users, Kt), bool)
    txt_counts = np.zeros((n_users, Kt), np.float32)
    np.logical_or.at(img_member, (train_users, image_labels[train_items]), True)
    np.logical_or.at(txt_member, (train_users, text_labels[train_items]), True)
    np.add.at(txt_counts, (train_users, text_labels[train_items]), 1.0)
    with np.errstate(invalid="ignore"):
        masked = np.where(txt_counts > 0, txt_counts, np.inf)
        minfreq = masked.min(axis=1)
        minfreq = np.where(np.isfinite(minfreq), minfreq, 0.0)
    # item-cluster indicator matrices: expanding per-user cluster rows to
    # per-item columns becomes an MXU matmul instead of a (B, I) gather
    img_onehot = np.zeros((Ki, len(image_labels)), np.float32)
    img_onehot[image_labels, np.arange(len(image_labels))] = 1.0
    txt_onehot = np.zeros((Kt, len(text_labels)), np.float32)
    txt_onehot[text_labels, np.arange(len(text_labels))] = 1.0
    return {
        "img_member": jnp.asarray(img_member),
        "txt_member": jnp.asarray(txt_member),
        "txt_counts": jnp.asarray(txt_counts),
        "txt_minfreq": jnp.asarray(minfreq.astype(np.float32)),
        "img_labels": jnp.asarray(image_labels.astype(np.int32)),
        "txt_labels": jnp.asarray(text_labels.astype(np.int32)),
        "img_onehot": jnp.asarray(img_onehot),
        "txt_onehot": jnp.asarray(txt_onehot),
    }


def interest_debias(
    key: jax.Array,
    users: jnp.ndarray,  # (B,) user ids of the batch rows
    origin: jnp.ndarray,  # (B, I) original interactions
    generated: jnp.ndarray,  # (B, I) generated interactions
    tables: Dict[str, jnp.ndarray],
    sample_ratio: float,
) -> jnp.ndarray:
    """Vectorized InterestDebiase.interest_query_debiase."""
    B, I = origin.shape
    flip01 = generated > origin
    flip10 = origin > generated
    sampled = jax.random.bernoulli(key, sample_ratio, (B, I))

    # per-user cluster rows -> per-item columns via indicator matmuls (the
    # (B, I) take_along_axis gather measured seconds per regen on v5e)
    img_ok = (tables["img_member"][users].astype(jnp.float32) @ tables["img_onehot"]) > 0
    txt_ok = (tables["txt_member"][users].astype(jnp.float32) @ tables["txt_onehot"]) > 0
    keep01 = (img_ok | txt_ok).astype(generated.dtype)

    # counts can exceed bf16's exact-integer range; keep this matmul f32
    freq = jnp.dot(
        tables["txt_counts"][users],
        tables["txt_onehot"],
        precision=jax.lax.Precision.HIGHEST,
    )
    minf = tables["txt_minfreq"][users][:, None]
    # accept removal (stay 0) when the cluster was rarely interacted
    keep10 = jnp.where(freq <= minf + 1.0, 0.0, 1.0).astype(generated.dtype)

    out = jnp.where(flip01 & sampled, keep01, generated)
    out = jnp.where(flip10 & sampled, keep10, out)
    return out
