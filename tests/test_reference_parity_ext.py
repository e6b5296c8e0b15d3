"""Extended numeric parity vs the ACTUAL reference implementation.

Extends tests/test_reference_parity.py (BPR/VBPR/LightGCN) to the generative
side: Gaussian diffusion schedule tables (DiffRec `GaussianDiffusion`),
GenRec-V1 flip schedules (`FlipInterestDiffusion.get_cum`), and the
deterministic eval-score paths of BM3 and FREEDOM with identical parameters.

Skipped when the reference mount is absent.
"""

import os
import sys

import jax
import numpy as np
import pytest

REF = "/root/reference/GenMMRec/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _patch_scipy_dok():
    import scipy.sparse as sp

    if not hasattr(sp.dok_matrix, "_update"):
        def _update(self, data):
            for k, v in data.items():
                self[k] = v

        sp.dok_matrix._update = _update


class _MockLoader:
    def __init__(self, td):
        self.td = td
        self.dataset = self

    def get_user_num(self):
        return self.td.n_users

    def get_item_num(self):
        return self.td.n_items

    def inter_matrix(self, form="coo"):
        import scipy.sparse as sp

        users = np.asarray(self.td.users)
        items = np.asarray(self.td.items)
        return sp.coo_matrix(
            (np.ones(len(users)), (users, items)),
            shape=(self.td.n_users, self.td.n_items),
        )


@pytest.fixture(scope="module")
def tiny_td():
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.data.arrays import build_train_data

    config = Config("BPR", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, _, _ = ds.split()
    return build_train_data(train_ds)


# ---------------------------------------------------------------------------
@pytest.mark.parametrize("noise_schedule", ["linear", "linear-var"])
def test_gaussian_schedule_matches_reference(noise_schedule):
    import torch

    _ref_path()
    from models.diffrec import GaussianDiffusion as RefGD

    from genmmrec_tpu.models.diffusion.schedule import make_schedule

    ref = RefGD(
        mean_type="x0",
        noise_schedule=noise_schedule,
        noise_scale=0.1,
        noise_min=0.001,
        noise_max=0.01,
        steps=100,
        device=torch.device("cpu"),
    )
    ours = make_schedule(noise_schedule, 0.1, 0.001, 0.01, 100, beta_fixed=True)

    pairs = [
        (ours.betas, ref.betas),
        (ours.alphas_cumprod, ref.alphas_cumprod),
        (ours.alphas_cumprod_prev, ref.alphas_cumprod_prev),
        (ours.sqrt_alphas_cumprod, ref.sqrt_alphas_cumprod),
        (ours.sqrt_one_minus_alphas_cumprod, ref.sqrt_one_minus_alphas_cumprod),
        (ours.posterior_variance, ref.posterior_variance),
        (ours.posterior_log_variance_clipped, ref.posterior_log_variance_clipped),
        (ours.posterior_mean_coef1, ref.posterior_mean_coef1),
        (ours.posterior_mean_coef2, ref.posterior_mean_coef2),
    ]
    for mine, theirs in pairs:
        np.testing.assert_allclose(
            np.asarray(mine), theirs.numpy().astype(np.float32),
            rtol=1e-6, atol=1e-7,
        )


def test_flip_schedule_matches_reference():
    import torch

    _ref_path()
    from models.genrecv1 import FlipInterestDiffusion as RefFlip

    from genmmrec_tpu.models.diffusion.flip import flip_schedules

    cfg = {
        "sparse_temp": 1.0, "ssl_gen1": 0.1, "ssl_gen2": 0.1, "ssl_gen3": 0.1,
        "visual_modality": True, "text_modality": True, "audio_modality": False,
    }
    ref = RefFlip(cfg, steps=5)
    rng = np.random.default_rng(0)
    # a sparse binary interaction batch like the trainer feeds
    x = (rng.random((16, 50)) < 0.07).astype(np.float32)
    g_ref, e_ref = ref.get_cum(torch.from_numpy(x))
    g_ours, e_ours = flip_schedules(np.asarray(x), 5)
    np.testing.assert_allclose(np.asarray(g_ours), g_ref.numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(e_ours), e_ref.numpy(), rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
def _mm_ref_config(td, tmp_path, ours, extra=None):
    np.save(tmp_path / "image_feat.npy", np.asarray(ours.v_feat))
    np.save(tmp_path / "text_feat.npy", np.asarray(ours.t_feat))
    cfg = {
        "USER_ID_FIELD": "userID",
        "ITEM_ID_FIELD": "itemID",
        "NEG_PREFIX": "neg_",
        "train_batch_size": 64,
        "device": "cpu",
        "end2end": False,
        "is_multimodal_model": True,
        "data_path": str(tmp_path) + "/",
        "dataset": "",
        "vision_feature_file": "image_feat.npy",
        "text_feature_file": "text_feat.npy",
        "embedding_size": 16,
        "reg_weight": 0.01,
    }
    cfg.update(extra or {})
    return cfg


def _copy_linear(ref_linear, p):
    import torch

    with torch.no_grad():
        ref_linear.weight.copy_(torch.from_numpy(np.asarray(p["w"])))
        ref_linear.bias.copy_(torch.from_numpy(np.asarray(p["b"])))


def test_bm3_scores_match_reference(tiny_td, tmp_path):
    import torch

    _ref_path()
    _patch_scipy_dok()
    from models.bm3 import BM3 as RefBM3

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    config = Config(
        "BM3", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "n_layers": 2, "reg_weight": 0.1, "cl_weight": 2.0, "dropout": 0.3},
    )
    ours = get_model("BM3")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(
        td, tmp_path, ours,
        {"n_layers": 2, "cl_weight": 2.0, "dropout": 0.3},
    )
    ref = RefBM3(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.user_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["user_embedding"]))
        )
        ref.item_id_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["item_id_embedding"]))
        )
        _copy_linear(ref.predictor, params["predictor"])
        _copy_linear(ref.image_trs, params["image_trs"])
        _copy_linear(ref.text_trs, params["text_trs"])
        ref.image_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["image_embedding"]))
        )
        ref.text_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["text_embedding"]))
        )

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefBM3.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=2e-4, atol=2e-4
    )


def test_freedom_scores_match_reference(tiny_td, tmp_path):
    import torch

    _ref_path()
    _patch_scipy_dok()
    from models.freedom import FREEDOM as RefFREEDOM

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "feat_embed_dim": 16, "knn_k": 5, "lambda_coeff": 0.9,
        "cf_model": "lightgcn", "n_mm_layers": 1, "n_ui_layers": 2,
        "mm_image_weight": 0.1, "dropout": 0.0, "degree_ratio": 1.0,
    }
    config = Config(
        "FREEDOM", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 0.001, **hp},
    )
    ours = get_model("FREEDOM")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))
    state = ours.init_state(jax.random.PRNGKey(1))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefFREEDOM(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.user_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["user_embedding"]))
        )
        ref.item_id_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["item_id_embedding"]))
        )
        _copy_linear(ref.image_trs, params["image_trs"])
        _copy_linear(ref.text_trs, params["text_trs"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, state, users))
    with torch.no_grad():
        ref_scores = RefFREEDOM.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )
