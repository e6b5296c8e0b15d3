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
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted"),
]


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


def _shim_models_common():
    """Some reference files import `models.common.*` (a stale path); alias it
    to the actual `common` package."""
    import importlib

    _ref_path()
    if "models.common" not in sys.modules:
        import models  # the reference's models package

        common = importlib.import_module("common")
        sys.modules["models.common"] = common
        models.common = common
        for sub in ("abstract_recommender", "loss", "init", "encoders"):
            try:
                sys.modules[f"models.common.{sub}"] = importlib.import_module(
                    f"common.{sub}"
                )
            except ImportError:
                pass


def _shim_torch_scatter():
    """The reference's utils.get_sparse_laplacian imports the torch_scatter
    CUDA extension (not installed here); provide an index_add_-based stub."""
    import types

    import torch

    if "torch_scatter" in sys.modules:
        return

    def scatter_add(src, index, dim=0, dim_size=None):
        if dim_size is None:
            dim_size = int(index.max()) + 1
        shape = list(src.shape)
        shape[dim] = dim_size
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
        return out.index_add_(dim, index, src)

    mod = types.ModuleType("torch_scatter")
    mod.scatter_add = scatter_add
    mod.scatter = lambda src, index, dim=0, dim_size=None, reduce="sum": (
        scatter_add(src, index, dim, dim_size)
    )
    sys.modules["torch_scatter"] = mod


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


def test_layergcn_scores_match_reference(tiny_td):
    import torch

    _ref_path()
    _patch_scipy_dok()
    _shim_models_common()
    from models.layergcn import LayerGCN as RefLayerGCN

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    config = Config(
        "LayerGCN", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "n_layers": 3, "reg_weight": 0.01, "dropout": 0.0},
    )
    ours = get_model("LayerGCN")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))
    state = ours.init_state(jax.random.PRNGKey(1))

    ref_cfg = {
        "USER_ID_FIELD": "userID", "ITEM_ID_FIELD": "itemID",
        "NEG_PREFIX": "neg_", "train_batch_size": 64, "device": "cpu",
        "end2end": False, "is_multimodal_model": False,
        "embedding_size": 16, "n_layers": 3, "reg_weight": 0.01,
        "dropout": 0.0,
    }
    ref = RefLayerGCN(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.user_embeddings.copy_(
            torch.from_numpy(np.asarray(params["user_embeddings"]))
        )
        ref.item_embeddings.copy_(
            torch.from_numpy(np.asarray(params["item_embeddings"]))
        )

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, state, users))
    with torch.no_grad():
        ref_scores = RefLayerGCN.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )


def test_mgcn_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    _ref_path()
    _patch_scipy_dok()
    # the reference unconditionally .cuda()s the modal adjacencies; make
    # cuda() a no-op on CPU for this test
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    _shim_torch_scatter()
    from models.mgcn import MGCN as RefMGCN

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {"cl_loss": 0.01, "n_ui_layers": 2, "knn_k": 5, "n_layers": 1}
    config = Config(
        "MGCN", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-4, **hp},
    )
    ours = get_model("MGCN")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefMGCN(ref_cfg, _MockLoader(td))
    ref.eval()

    def copy_seq(seq, p1, p2=None):
        _copy_linear(seq[0], p1)
        if p2 is not None:
            with torch.no_grad():
                seq[2].weight.copy_(torch.from_numpy(np.asarray(p2["w"])))

    with torch.no_grad():
        ref.user_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["user_embedding"]))
        )
        ref.item_id_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["item_id_embedding"]))
        )
        ref.image_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.v_feat)))
        ref.text_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.t_feat)))
        _copy_linear(ref.image_trs, params["image_trs"])
        _copy_linear(ref.text_trs, params["text_trs"])
        copy_seq(ref.query_common, params["query1"], params["query2"])
        copy_seq(ref.gate_v, params["gate_v"])
        copy_seq(ref.gate_t, params["gate_t"])
        copy_seq(ref.gate_image_prefer, params["gate_image_prefer"])
        copy_seq(ref.gate_text_prefer, params["gate_text_prefer"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefMGCN.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )


def test_gume_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    _ref_path()
    _patch_scipy_dok()
    _shim_torch_scatter()
    from models.gume import GUME as RefGUME

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    # knn_k=10 is load-bearing: the reference's find_inter groups KNN edges
    # in hardcoded runs of 10 (gume.py:139)
    hp = {
        "bm_loss": 0.1, "um_loss": 0.1, "vt_loss": 0.1, "reg_weight_1": 1e-4,
        "reg_weight_2": 1e-2, "bm_temp": 0.2, "um_temp": 0.2,
        "n_ui_layers": 2, "knn_k": 10, "n_layers": 1,
    }
    config = Config(
        "GUME", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16, **hp},
    )
    ours = get_model("GUME")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefGUME(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.user_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["user_embedding"]))
        )
        ref.item_id_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["item_id_embedding"]))
        )
        ref.extended_image_user.weight.copy_(
            torch.from_numpy(np.asarray(params["extended_image_user"]))
        )
        ref.extended_text_user.weight.copy_(
            torch.from_numpy(np.asarray(params["extended_text_user"]))
        )
        ref.image_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.v_feat)))
        ref.text_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.t_feat)))
        _copy_linear(ref.image_reduce_dim, params["image_reduce"])
        _copy_linear(ref.image_trans_dim[0], params["image_trans"])
        _copy_linear(ref.text_reduce_dim, params["text_reduce"])
        _copy_linear(ref.text_trans_dim[0], params["text_trans"])
        _copy_linear(ref.separate_coarse[0], params["separate1"])
        ref.separate_coarse[2].weight.copy_(
            torch.from_numpy(np.asarray(params["separate2"]["w"]))
        )
        _copy_linear(ref.image_behavior[0], params["image_behavior"])
        _copy_linear(ref.text_behavior[0], params["text_behavior"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefGUME.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )


def test_lattice_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    _ref_path()
    _patch_scipy_dok()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from models.lattice import LATTICE as RefLATTICE

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "feat_embed_dim": 16, "weight_size": [16, 16], "knn_k": 5,
        "lambda_coeff": 0.9, "cf_model": "lightgcn", "n_layers": 1,
        "mess_dropout": [0.1, 0.1],
    }
    config = Config(
        "LATTICE", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("LATTICE")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefLATTICE(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.user_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["user_embedding"]))
        )
        ref.item_id_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["item_id_embedding"]))
        )
        ref.image_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.v_feat)))
        ref.text_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.t_feat)))
        _copy_linear(ref.image_trs, params["image_trs"])
        _copy_linear(ref.text_trs, params["text_trs"])
        ref.modal_weight.copy_(torch.from_numpy(np.asarray(params["modal_weight"])))

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefLATTICE.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )


def test_lgmrec_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch
    import torch.nn.functional as F

    _ref_path()
    _patch_scipy_dok()
    import models.lgmrec as ref_mod
    from models.lgmrec import LGMRec as RefLGMRec

    import genmmrec_tpu.models.lgmrec as ours_mod
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    # gumbel_softmax is stochastic even in eval mode; pin both sides to the
    # deterministic softmax(logits/tau) limit for the comparison
    monkeypatch.setattr(
        ref_mod.F, "gumbel_softmax",
        lambda logits, tau, dim=1, hard=False: F.softmax(logits / tau, dim=dim),
    )
    monkeypatch.setattr(
        ours_mod.LGMRec, "_gumbel_softmax",
        lambda self, key, logits: jax.nn.softmax(logits / self.tau, axis=1),
    )

    td = tiny_td
    hp = {
        "feat_embed_dim": 16, "cf_model": "lightgcn", "n_mm_layers": 1,
        "n_ui_layers": 2, "n_hyper_layer": 1, "hyper_num": 4,
        "keep_rate": 1.0, "alpha": 0.2, "cl_weight": 0.01,
    }
    config = Config(
        "LGMRec", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("LGMRec")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefLGMRec(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.user_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["user_embedding"]))
        )
        ref.item_id_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["item_id_embedding"]))
        )
        ref.image_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.v_feat)))
        ref.text_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.t_feat)))
        ref.item_image_trs.copy_(torch.from_numpy(np.asarray(params["item_image_trs"])))
        ref.item_text_trs.copy_(torch.from_numpy(np.asarray(params["item_text_trs"])))
        ref.v_hyper.copy_(torch.from_numpy(np.asarray(params["v_hyper"])))
        ref.t_hyper.copy_(torch.from_numpy(np.asarray(params["t_hyper"])))

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefLGMRec.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    # ours normalizes with sqrt(sum+eps) (finite grad at zero rows) vs
    # torch F.normalize's max(norm, eps) — near-zero GHE rows differ at the
    # few-1e-3 level; everything else matches tightly
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-3, atol=5e-3
    )


def test_selfcfed_lgn_scores_match_reference(tiny_td):
    import torch

    _ref_path()
    _patch_scipy_dok()
    from models.selfcfed_lgn import SELFCFED_LGN as RefSelf

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    config = Config(
        "SELFCFED_LGN", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "n_layers": 2, "reg_weight": 0.01, "dropout": 0.2},
    )
    ours = get_model("SELFCFED_LGN")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = {
        "USER_ID_FIELD": "userID", "ITEM_ID_FIELD": "itemID",
        "NEG_PREFIX": "neg_", "train_batch_size": 64, "device": "cpu",
        "end2end": False, "is_multimodal_model": False,
        "embedding_size": 16, "n_layers": 2, "reg_weight": 0.01,
        "dropout": 0.2,
    }
    ref = RefSelf(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.online_encoder.embedding_dict["user_emb"].copy_(
            torch.from_numpy(np.asarray(params["encoder"]["user_emb"]))
        )
        ref.online_encoder.embedding_dict["item_emb"].copy_(
            torch.from_numpy(np.asarray(params["encoder"]["item_emb"]))
        )
        _copy_linear(ref.predictor, params["predictor"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefSelf.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )


def test_itemknncbf_scores_match_reference(tiny_td, tmp_path):
    import torch

    _ref_path()
    _patch_scipy_dok()
    from models.itemknncbf import ItemKNNCBF as RefKNN

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    config = Config(
        "ItemKNNCBF", "tiny",
        {"save_recommended_topk": False, "knn_k": 5, "shrink": 10.0},
    )
    ours = get_model("ItemKNNCBF")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, {"knn_k": 5, "shrink": 10.0})
    ref = RefKNN(ref_cfg, _MockLoader(td))

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefKNN.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )


def test_smore_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    _ref_path()
    _patch_scipy_dok()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    _shim_torch_scatter()
    from models.smore import SMORE as RefSMORE

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "cl_loss": 0.01, "n_ui_layers": 2, "n_layers": 1,
        "image_knn_k": 5, "text_knn_k": 5, "dropout_rate": 0.1,
    }
    config = Config(
        "SMORE", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-4, **hp},
    )
    ours = get_model("SMORE")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefSMORE(ref_cfg, _MockLoader(td))
    ref.eval()

    def copy_seq2(seq, p):  # Sequential(Linear, Sigmoid)
        _copy_linear(seq[0], p)

    def copy_q(seq, p):  # Sequential(Linear, Tanh, Linear(bias=False))
        _copy_linear(seq[0], p["l1"])
        with torch.no_grad():
            seq[2].weight.copy_(torch.from_numpy(np.asarray(p["l2"]["w"])))

    with torch.no_grad():
        ref.user_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["user_embedding"]))
        )
        ref.item_id_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["item_id_embedding"]))
        )
        ref.image_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.v_feat)))
        ref.text_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.t_feat)))
        _copy_linear(ref.image_trs, params["image_trs"])
        _copy_linear(ref.text_trs, params["text_trs"])
        copy_q(ref.query_v, params["query_v"])
        copy_q(ref.query_t, params["query_t"])
        copy_seq2(ref.gate_v, params["gate_v"])
        copy_seq2(ref.gate_t, params["gate_t"])
        copy_seq2(ref.gate_f, params["gate_f"])
        copy_seq2(ref.gate_image_prefer, params["gate_image_prefer"])
        copy_seq2(ref.gate_text_prefer, params["gate_text_prefer"])
        copy_seq2(ref.gate_fusion_prefer, params["gate_fusion_prefer"])
        ref.image_complex_weight.copy_(
            torch.from_numpy(np.asarray(params["image_complex_weight"]))
        )
        ref.text_complex_weight.copy_(
            torch.from_numpy(np.asarray(params["text_complex_weight"]))
        )
        ref.fusion_complex_weight.copy_(
            torch.from_numpy(np.asarray(params["fusion_complex_weight"]))
        )

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefSMORE.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )


def test_slmrec_scores_match_reference(tiny_td, tmp_path):
    import torch

    _ref_path()
    _patch_scipy_dok()
    _shim_torch_scatter()
    from models.slmrec import SLMRec as RefSLMRec

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "recdim": 16, "layer_num": 2, "mm_fusion_mode": "concat",
        "temp": 0.2, "ssl_task": "FAC", "ssl_temp": 0.1, "ssl_alpha": 0.01,
        "init": "xavier", "adj_type": "pre", "dropout_rate": 0.3,
    }
    config = Config(
        "SLMRec", "tiny", {"save_recommended_topk": False, **hp},
    )
    ours = get_model("SLMRec")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, {**hp, "dataset": ""})
    ref = RefSLMRec(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.embedding_user.weight.copy_(
            torch.from_numpy(np.asarray(params["embedding_user"]))
        )
        ref.embedding_item.weight.copy_(
            torch.from_numpy(np.asarray(params["embedding_item"]))
        )
        _copy_linear(ref.v_dense, params["v_dense"])
        _copy_linear(ref.t_dense, params["t_dense"])
        _copy_linear(ref.embedding_user_after_GCN, params["user_after"])
        _copy_linear(ref.embedding_item_after_GCN, params["item_after"])
        ref.all_users, ref.all_items = ref.compute()

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefSLMRec.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )

    # training loss (main InfoNCE + FAC SSL), ref slmrec.py:332-337
    with torch.no_grad():
        for name in ("g_i_iv", "g_v_iv", "g_iv_iva", "g_iva_ivat", "g_t_ivat"):
            _copy_linear(getattr(ref, name), params[name])
    bu = np.asarray(td.users[:32])
    bp = np.asarray(td.items[:32])
    batch = {
        "users": bu, "pos": bp, "neg": np.zeros(32, np.int32),
        "weight": np.ones(32, np.float32),
    }
    ours_loss = float(ours.loss(params, {}, batch, jax.random.PRNGKey(1))[0])
    with torch.no_grad():
        ref_loss = float(RefSLMRec.calculate_loss(
            ref, [torch.from_numpy(bu.astype(np.int64)),
                  torch.from_numpy(bp.astype(np.int64))]
        ))
    assert abs(ours_loss - ref_loss) < 5e-4, (ours_loss, ref_loss)


def test_damrs_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    _ref_path()
    _patch_scipy_dok()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from models.damrs import DAMRS as RefDAMRS

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    # synthetic session graph dict {item: ([neighbors], [weights])}
    rng = np.random.default_rng(7)
    n_items = td.n_items
    graph_dict = {}
    for i in range(0, n_items, 3):
        nbrs = rng.choice(n_items, size=4, replace=False).tolist()
        graph_dict[i] = (nbrs, rng.random(4).astype(np.float32).tolist())
    np.save(tmp_path / "item_graph_dict.npy", graph_dict, allow_pickle=True)
    # our Config pins dataset="tiny" (the positional arg wins), so the model
    # resolves <data_path>/tiny/; the reference config uses dataset=""
    (tmp_path / "tiny").mkdir()
    np.save(tmp_path / "tiny" / "item_graph_dict.npy", graph_dict, allow_pickle=True)

    hp = {
        "lambda_coeff": 0.9, "cf_model": "lightgcn", "n_ui_layers": 2,
        "n_mm_layers": 1, "knn_k": 5, "kl_weight": 0.01,
        "neighbor_weight": 0.1,
        "item_graph_dict_file": "item_graph_dict.npy",
    }
    config = Config(
        "DAMRS", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-4, "data_path": str(tmp_path) + "/", "dataset": "",
         **hp},
    )
    ours = get_model("DAMRS")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefDAMRS(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.user_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["user_embedding"]))
        )
        ref.item_id_embedding.weight.copy_(
            torch.from_numpy(np.asarray(params["item_id_embedding"]))
        )

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefDAMRS.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )


def test_diffrec_inference_matches_reference(tiny_td):
    import torch

    _ref_path()
    from models.diffrec import DiffRec as RefDiffRec

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "steps": 10, "noise_schedule": "linear", "noise_scale": 0.1,
        "noise_min": 0.001, "noise_max": 0.01, "dims": [32],
        "embedding_size": 8, "dropout": 0.5, "reweight": True,
        "sampling_steps": 0,
    }
    config = Config(
        "DiffRec", "tiny", {"save_recommended_topk": False, **hp},
    )
    ours = get_model("DiffRec")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))
    state = ours.init_state(jax.random.PRNGKey(1))

    ref_cfg = {
        "USER_ID_FIELD": "userID", "ITEM_ID_FIELD": "itemID",
        "NEG_PREFIX": "neg_", "train_batch_size": 64, "device": "cpu",
        "end2end": False, "is_multimodal_model": False, **hp,
    }
    ref = RefDiffRec(ref_cfg, _MockLoader(td))
    ref.eval()
    dnn = params["dnn"]
    with torch.no_grad():
        ref.model.emb_layer.weight.copy_(
            torch.from_numpy(np.asarray(dnn["emb_layer"]["w"]))
        )
        ref.model.emb_layer.bias.copy_(
            torch.from_numpy(np.asarray(dnn["emb_layer"]["b"]))
        )
        for dst, src in zip(ref.model.in_layers, dnn["in_layers"]):
            dst.weight.copy_(torch.from_numpy(np.asarray(src["w"])))
            dst.bias.copy_(torch.from_numpy(np.asarray(src["b"])))
        for dst, src in zip(ref.model.out_layers, dnn["out_layers"]):
            dst.weight.copy_(torch.from_numpy(np.asarray(src["w"])))
            dst.bias.copy_(torch.from_numpy(np.asarray(src["b"])))

    users = np.asarray(td.users[:8])
    # sampling_steps=0 and sampling_noise=False: the full reverse chain is
    # deterministic (p_mean only), so scores must match exactly
    ours_scores = np.asarray(ours.scores(params, state, users))
    with torch.no_grad():
        ref_scores = RefDiffRec.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )


def test_pgl_scores_match_reference(tiny_td, tmp_path):
    import torch

    _ref_path()
    _patch_scipy_dok()
    from models.pgl import PGL as RefPGL

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "feat_embed_dim": 16, "knn_k": 5, "lambda_coeff": 0.9,
        "n_mm_layers": 1, "n_ui_layers": 2, "mm_image_weight": 0.1,
        "dropout": 0.1, "mode": "local",
    }
    config = Config(
        "PGL", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 0.01, **hp},
    )
    ours = get_model("PGL")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))
    state = ours.init_state(jax.random.PRNGKey(1))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefPGL(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.user_image.weight.copy_(
            torch.from_numpy(np.asarray(params["user_image"]))
        )
        ref.user_text.weight.copy_(
            torch.from_numpy(np.asarray(params["user_text"]))
        )
        ref.image_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.v_feat)))
        ref.text_embedding.weight.copy_(torch.from_numpy(np.asarray(ours.t_feat)))
        _copy_linear(ref.image_trs, params["image_trs"])
        _copy_linear(ref.text_trs, params["text_trs"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, state, users))
    with torch.no_grad():
        ref_scores = RefPGL.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=5e-4, atol=5e-4
    )


def test_diffmm_forward_mm_matches_reference(tiny_td, tmp_path):
    import torch

    _ref_path()
    _patch_scipy_dok()
    from models.diffmm import DiffMM as RefDiffMM

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "n_layers": 2, "keep_rate": 1.0, "trans_type": 0,
        "ris_adj_lambda": 0.2, "ris_lambda": 0.5, "cl_method": 0,
        "ssl_reg": 0.01, "temperature": 0.5, "e_loss": 0.1,
        "noise_scale": 0.1, "noise_min": 0.0001, "noise_max": 0.02,
        "steps": 5, "sampling_steps": 0, "sampling_noise": False,
        "rebuild_k": 3, "d_emb_size": 8, "norm": False, "dims": [32],
    }
    config = Config(
        "DiffMM", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("DiffMM")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    # deterministic regenerated graphs from fixed per-user top-k choices
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    topk_img = jnp.asarray(
        rng.integers(0, td.n_items, (td.n_users, 3)).astype(np.int32)
    )
    topk_txt = jnp.asarray(
        rng.integers(0, td.n_items, (td.n_users, 3)).astype(np.int32)
    )

    state = {
        "image_ui": ours.rebuild_ui_graph(topk_img, jax.random.PRNGKey(9)),
        "text_ui": ours.rebuild_ui_graph(topk_txt, jax.random.PRNGKey(10)),
    }

    ref_cfg = _mm_ref_config(
        td, tmp_path, ours, {**hp, "trans": hp["trans_type"]},
    )
    ref_cfg["trans_type"] = hp["trans_type"]
    ref = RefDiffMM(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.uEmbeds.copy_(torch.from_numpy(np.asarray(params["rec"]["uEmbeds"])))
        ref.iEmbeds.copy_(torch.from_numpy(np.asarray(params["rec"]["iEmbeds"])))
        ref.modal_weight.copy_(
            torch.from_numpy(np.asarray(params["rec"]["modal_weight"]))
        )
        # trans_type 0: raw projection matrices
        ref.image_trans.copy_(
            torch.from_numpy(np.asarray(params["rec"]["image_trans"]))
        )
        ref.text_trans.copy_(
            torch.from_numpy(np.asarray(params["rec"]["text_trans"]))
        )

    # hand the reference the SAME regenerated graphs as torch sparse tensors
    def to_torch_sparse(g):
        N = td.n_users + td.n_items
        idx = torch.from_numpy(
            np.stack([np.asarray(g["rows"]), np.asarray(g["cols"])]).astype(np.int64)
        )
        return torch.sparse_coo_tensor(
            idx, torch.from_numpy(np.asarray(g["vals"])), (N, N)
        )

    ref.image_UI_matrix = to_torch_sparse(state["image_ui"])
    ref.text_UI_matrix = to_torch_sparse(state["text_ui"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, state, users))
    with torch.no_grad():
        ref_scores = RefDiffMM.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )


def test_ddrm_encoder_and_denoiser_match_reference(tiny_td):
    import torch

    _ref_path()
    from models.ddrm import DDRM as RefDDRM

    import genmmrec_tpu.models.ddrm as ours_mod
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "lightGCN_n_layers": 2, "keep_prob": 1.0, "A_split": False,
        "dropout": False, "steps": 5, "alpha": 0.5, "beta": 1.0,
        "act": "tanh", "norm": False, "sampling_steps": 0,
        "sampling_noise": False, "dims": [32],
        "noise_schedule": "linear-var", "noise_scale": 0.1,
        "noise_min": 0.0001, "noise_max": 0.02,
    }
    config = Config(
        "DDRM", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("DDRM")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = {
        "USER_ID_FIELD": "userID", "ITEM_ID_FIELD": "itemID",
        "NEG_PREFIX": "neg_", "train_batch_size": 64, "device": "cpu",
        "end2end": False, "is_multimodal_model": False,
        "embedding_size": 16, "reg_weight": 1e-5, **hp,
    }
    ref = RefDDRM(ref_cfg, _MockLoader(td))
    ref.eval()
    with torch.no_grad():
        ref.rec_model.embedding_user.weight.copy_(
            torch.from_numpy(np.asarray(params["user_emb"]))
        )
        ref.rec_model.embedding_item.weight.copy_(
            torch.from_numpy(np.asarray(params["item_emb"]))
        )
        for name in ("user_reverse", "item_reverse"):
            dst = getattr(ref, f"{name}_model")
            src = params[name]
            dst.emb_layer.weight.copy_(
                torch.from_numpy(np.asarray(src["emb_layer"]["w"]))
            )
            dst.emb_layer.bias.copy_(
                torch.from_numpy(np.asarray(src["emb_layer"]["b"]))
            )
            for d, s in zip(dst.in_layers, src["in_layers"]):
                d.weight.copy_(torch.from_numpy(np.asarray(s["w"])))
                d.bias.copy_(torch.from_numpy(np.asarray(s["b"])))
            for d, s in zip(dst.out_layers, src["out_layers"]):
                d.weight.copy_(torch.from_numpy(np.asarray(s["w"])))
                d.bias.copy_(torch.from_numpy(np.asarray(s["b"])))

    # (a) LightGCN tower parity
    u_o, i_o = ours.encode(params)
    with torch.no_grad():
        u_r, i_r = ref.rec_model()
    np.testing.assert_allclose(np.asarray(u_o), u_r.numpy(), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(i_o), i_r.numpy(), rtol=5e-4, atol=5e-4)

    # (b) conditional denoiser parity on fixed inputs
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(6, 16)).astype(np.float32)
    cond = rng.normal(size=(6, 16)).astype(np.float32)
    t = np.array([0, 1, 2, 3, 4, 2], np.int32)
    out_o = ours_mod._apply_cond_dnn(
        params["item_reverse"], noise, cond, t, "tanh", False
    )
    with torch.no_grad():
        out_r = ref.item_reverse_model(
            torch.from_numpy(noise), torch.from_numpy(cond),
            torch.from_numpy(t.astype(np.int64)),
        )
    np.testing.assert_allclose(np.asarray(out_o), out_r.numpy(), rtol=5e-4, atol=5e-4)


def test_mmgcn_scores_match_reference(tiny_td, tmp_path):
    import torch

    import tests._tg_shim as tg_shim

    tg_shim.install()
    _ref_path()
    _patch_scipy_dok()
    from models.mmgcn import MMGCN as RefMMGCN

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {"n_layers": 2, "train_batch_size": 64}
    config = Config(
        "MMGCN", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("MMGCN")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefMMGCN(ref_cfg, _MockLoader(td))
    ref.eval()

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    with torch.no_grad():
        copy_t(ref.id_embedding, params["id_embedding"])
        ref.image_embedding = None  # unused
        for name, gcn, has_latent in (("v_gcn", ref.v_gcn, True), ("t_gcn", ref.t_gcn, False)):
            p = params[name]
            copy_t(gcn.preference, p["preference"])
            copy_t(gcn.conv_embed_1.weight, p["conv1_w"])
            copy_t(gcn.conv_embed_2.weight, p["conv2_w"])
            copy_t(gcn.conv_embed_3.weight, p["conv3_w"])
            for li in (1, 2, 3):
                _copy_linear(getattr(gcn, f"linear_layer{li}"), p[f"lin{li}"])
                _copy_linear(getattr(gcn, f"g_layer{li}"), p[f"g{li}"])
            if has_latent:
                _copy_linear(gcn.MLP, p["mlp"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        RefMMGCN.forward(ref)  # sets ref.result
        ref_scores = RefMMGCN.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )


def test_grcn_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    import tests._tg_shim as tg_shim

    tg_shim.install()
    _ref_path()
    _patch_scipy_dok()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from models.grcn import GRCN as RefGRCN

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {"latent_embedding": 16, "n_layers": 2, "train_batch_size": 64}
    config = Config(
        "GRCN", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("GRCN")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefGRCN(ref_cfg, _MockLoader(td))
    ref.eval()

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    with torch.no_grad():
        copy_t(ref.id_gcn.id_embedding, params["id_embedding"])
        copy_t(ref.v_gcn.preference, params["v_preference"])
        copy_t(ref.t_gcn.preference, params["t_preference"])
        _copy_linear(ref.v_gcn.MLP, params["v_mlp"])
        _copy_linear(ref.t_gcn.MLP, params["t_mlp"])
        copy_t(ref.model_specific_conf, params["model_specific_conf"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        RefGRCN.forward(ref)  # sets ref.result
        ref_scores = RefGRCN.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )


def test_dualgnn_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    import tests._tg_shim as tg_shim

    tg_shim.install()
    _ref_path()
    _patch_scipy_dok()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from models.dualgnn import DualGNN as RefDualGNN

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    # every user gets exactly k=40 neighbors so neither side hits the
    # random fill path in topk_sample
    rng = np.random.default_rng(5)
    graph_dict = {
        u: (
            rng.choice(td.n_users, size=40, replace=False).tolist(),
            rng.random(40).astype(np.float64).tolist(),
        )
        for u in range(td.n_users)
    }
    np.save(tmp_path / "user_graph_dict.npy", graph_dict, allow_pickle=True)
    (tmp_path / "tiny").mkdir()
    np.save(tmp_path / "tiny" / "user_graph_dict.npy", graph_dict, allow_pickle=True)

    hp = {"aggr_mode": "add", "user_graph_dict_file": "user_graph_dict.npy",
          "train_batch_size": 64}
    config = Config(
        "DualGNN", "tiny",
        {"save_recommended_topk": False, "embedding_size": 64,
         "reg_weight": 1e-5, "data_path": str(tmp_path) + "/", **hp},
    )
    ours = get_model("DualGNN")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, {**hp, "embedding_size": 64})
    ref = RefDualGNN(ref_cfg, _MockLoader(td))
    ref.eval()
    ref.pre_epoch_processing()

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    with torch.no_grad():
        copy_t(ref.v_gcn.preference, params["v_preference"])
        copy_t(ref.t_gcn.preference, params["t_preference"])
        _copy_linear(ref.v_gcn.MLP, params["v_mlp"])
        _copy_linear(ref.v_gcn.MLP_1, params["v_mlp1"])
        _copy_linear(ref.t_gcn.MLP, params["t_mlp"])
        _copy_linear(ref.t_gcn.MLP_1, params["t_mlp1"])
        copy_t(ref.weight_u, params["weight_u"])
        copy_t(ref.weight_i, params["weight_i"])

    # on CUDA the reference's result_embed Parameter decays to a plain
    # tensor via .to(device); emulate that so forward's assignment works
    del ref._parameters["result_embed"]

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        # forward populates result_embed; feed a dummy interaction
        it = torch.from_numpy(np.zeros(4, np.int64))
        RefDualGNN.forward(ref, [torch.from_numpy(users[:4].astype(np.int64)), it.clone(), it.clone()])
        ref_scores = RefDualGNN.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )


def test_dragon_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    import tests._tg_shim as tg_shim

    tg_shim.install()
    _ref_path()
    _patch_scipy_dok()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from models.dragon import DRAGON as RefDRAGON

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    rng = np.random.default_rng(5)
    graph_dict = {
        u: (
            rng.choice(td.n_users, size=40, replace=False).tolist(),
            rng.random(40).astype(np.float64).tolist(),
        )
        for u in range(td.n_users)
    }
    np.save(tmp_path / "user_graph_dict.npy", graph_dict, allow_pickle=True)
    (tmp_path / "tiny").mkdir()
    np.save(tmp_path / "tiny" / "user_graph_dict.npy", graph_dict, allow_pickle=True)

    hp = {"aggr_mode": "add", "user_graph_dict_file": "user_graph_dict.npy",
          "train_batch_size": 64, "knn_k": 5, "mm_image_weight": 0.1,
          "feat_embed_dim": 64, "n_mm_layers": 1}
    config = Config(
        "DRAGON", "tiny",
        {"save_recommended_topk": False, "embedding_size": 64,
         "reg_weight": 1e-5, "data_path": str(tmp_path) + "/", **hp},
    )
    ours = get_model("DRAGON")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, {**hp, "embedding_size": 64})
    ref = RefDRAGON(ref_cfg, _MockLoader(td))
    ref.eval()
    ref.pre_epoch_processing()

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    with torch.no_grad():
        copy_t(ref.v_gcn.preference, params["v_preference"])
        copy_t(ref.t_gcn.preference, params["t_preference"])
        _copy_linear(ref.v_gcn.MLP, params["v_mlp"])
        _copy_linear(ref.v_gcn.MLP_1, params["v_mlp1"])
        _copy_linear(ref.t_gcn.MLP, params["t_mlp"])
        _copy_linear(ref.t_gcn.MLP_1, params["t_mlp1"])
        copy_t(ref.weight_u, params["weight_u"])
        copy_t(ref.weight_i, params["weight_i"])

    if "result_embed" in ref._parameters:
        del ref._parameters["result_embed"]

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        it = torch.from_numpy(np.zeros(4, np.int64))
        RefDRAGON.forward(ref, [torch.from_numpy(users[:4].astype(np.int64)), it.clone(), it.clone()])
        ref_scores = RefDRAGON.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )


def test_mvgae_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    import tests._tg_shim as tg_shim

    tg_shim.install()
    _ref_path()
    _patch_scipy_dok()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from models.mvgae import MVGAE as RefMVGAE

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {"n_layers": 2, "beta": 0.1, "train_batch_size": 64}
    config = Config(
        "MVGAE", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("MVGAE")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefMVGAE(ref_cfg, _MockLoader(td))
    ref.eval()

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    with torch.no_grad():
        copy_t(ref.collaborative, params["collaborative"])
        ref.c_gcn.features = ref.collaborative
        for name, gcn in (("v_gcn", ref.v_gcn), ("t_gcn", ref.t_gcn), ("c_gcn", ref.c_gcn)):
            p = params[name]
            copy_t(gcn.preference, p["preference"])
            _copy_linear(gcn.MLP, p["mlp"])
            for li, (cw, gl) in (
                ("1", ("conv1", "g1")), ("2", ("conv2", "g2")),
            ):
                copy_t(getattr(gcn, f"conv_embed_{li}").weight, p[cw]["w"])
                copy_t(getattr(gcn, f"conv_embed_{li}").bias, p[cw]["b"])
                _copy_linear(getattr(gcn, f"g_layer{li}"), p[gl])
            for li, (cw, ll, gl) in (
                ("4", ("conv4", "lin4", "g4")), ("5", ("conv5", "lin5", "g5")),
            ):
                copy_t(getattr(gcn, f"conv_embed_{li}").weight, p[cw]["w"])
                copy_t(getattr(gcn, f"conv_embed_{li}").bias, p[cw]["b"])
                _copy_linear(getattr(gcn, f"linear_layer{li}"), p[ll])
                _copy_linear(getattr(gcn, f"g_layer{li}"), p[gl])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        RefMVGAE.forward(ref)  # sets result_embed
        ref_scores = RefMVGAE.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )


def test_cohesion_scores_match_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    import tests._tg_shim as tg_shim

    tg_shim.install()
    _ref_path()
    _patch_scipy_dok()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    import types as _types

    # cohesion imports torch_sparse at module level but never uses it
    sys.modules.setdefault("torch_sparse", _types.ModuleType("torch_sparse"))
    from models.cohesion import COHESION as RefCOHESION

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    rng = np.random.default_rng(5)
    graph_dict = {
        u: (
            rng.choice(td.n_users, size=40, replace=False).tolist(),
            rng.random(40).astype(np.float64).tolist(),
        )
        for u in range(td.n_users)
    }
    np.save(tmp_path / "user_graph_dict.npy", graph_dict, allow_pickle=True)
    (tmp_path / "tiny").mkdir()
    np.save(tmp_path / "tiny" / "user_graph_dict.npy", graph_dict, allow_pickle=True)

    hp = {"feat_embed_dim": 64, "n_mm_layers": 1, "knn_k": 5,
          "mm_image_weight": 0.1, "dropout": 0.0, "num_layer": 2,
          "user_graph_dict_file": "user_graph_dict.npy"}
    config = Config(
        "COHESION", "tiny",
        {"save_recommended_topk": False, "embedding_size": 192,
         "reg_weight": 1e-5, "data_path": str(tmp_path) + "/", **hp},
    )
    ours = get_model("COHESION")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))
    state = ours.init_state(jax.random.PRNGKey(1))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, {**hp, "embedding_size": 192})
    ref = RefCOHESION(ref_cfg, _MockLoader(td))
    ref.eval()
    ref.pre_epoch_processing()

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    with torch.no_grad():
        copy_t(ref.id_feat, params["id_feat"])
        for name, gcn in (("id_gcn", ref.id_gcn), ("v_gcn", ref.v_gcn), ("t_gcn", ref.t_gcn)):
            p = params[name]
            copy_t(gcn.preference, p["preference"])
            _copy_linear(gcn.MLP, p["mlp"])
            _copy_linear(gcn.MLP_1, p["mlp1"])
        copy_t(ref.weight_u, params["weight_u"])
    # ref id_gcn holds features=id_feat by reference at construction; rebind
    ref.id_gcn_features = ref.id_feat

    if "result_embed" in ref._parameters:
        del ref._parameters["result_embed"]

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, state, users))
    with torch.no_grad():
        it = torch.from_numpy(np.zeros(4, np.int64))
        RefCOHESION.forward(ref, [torch.from_numpy(users[:4].astype(np.int64)), it.clone(), it.clone()])
        ref_scores = RefCOHESION.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )


class _DedupedLoader(_MockLoader):
    """inter_matrix without duplicate pairs, so both sides see an identical
    binary R (the single synthetic duplicate otherwise becomes a 2.0 after
    scipy's astype coalescing on the reference side)."""

    def inter_matrix(self, form="coo"):
        import scipy.sparse as sp

        pairs = np.unique(
            np.stack(
                [np.asarray(self.td.users), np.asarray(self.td.items)], axis=1
            ),
            axis=0,
        )
        return sp.coo_matrix(
            (np.ones(len(pairs)), (pairs[:, 0], pairs[:, 1])),
            shape=(self.td.n_users, self.td.n_items),
        )


def test_ld4mrec_inference_matches_reference(tiny_td, tmp_path):
    import torch

    _ref_path()
    from models.ld4mrec import LD4MRec as RefLD4MRec

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "steps": 5, "noise_schedule": "linear", "noise_min": 0.001,
        "noise_max": 0.01, "svd_k": 8, "smoothing_gamma": 0.01,
        "cnet_hidden_size": 32, "cnet_n_layers": 2, "dropout": 0.1,
        "min_noise_level": 0.0001,
    }
    config = Config(
        "LD4MRec", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16, **hp},
    )
    ours = get_model("LD4MRec")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefLD4MRec(ref_cfg, _DedupedLoader(td))
    ref.eval()

    # svds signs are ambiguous (flip with input storage format); magnitudes
    # must agree, then hand the reference our canonicalized embeddings so
    # the downstream network comparison is sign-consistent
    np.testing.assert_allclose(
        np.abs(np.asarray(ours.user_svd_emb)), np.abs(ref.user_svd_emb.numpy()),
        rtol=2e-3, atol=2e-3,
    )
    ref.user_svd_emb = torch.from_numpy(np.asarray(ours.user_svd_emb))

    with torch.no_grad():
        _copy_linear(ref.mm_project, params["mm_project"])
        _copy_linear(ref.cnet.item_proj, params["item_proj"])
        _copy_linear(ref.cnet.cond_proj, params["cond_proj"])
        _copy_linear(ref.cnet.time_proj, params["time_proj"])
        _copy_linear(ref.cnet.output_proj, params["output_proj"])
        ref.t_in.copy_(torch.from_numpy(np.asarray(params["t_in"])))
        for dst, src in zip(ref.cnet.layers, params["layers"]):
            dst.norm1.weight.copy_(torch.from_numpy(np.asarray(src["ln"]["g"])))
            dst.norm1.bias.copy_(torch.from_numpy(np.asarray(src["ln"]["b"])))
            _copy_linear(dst.linear1, src["l1"])
            _copy_linear(dst.linear2, src["l2"])
            _copy_linear(dst.cond_scale, src["scale"])
            _copy_linear(dst.cond_shift, src["shift"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefLD4MRec.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=2e-3, atol=2e-3
    )


def test_diffgraph_inference_matches_reference(tiny_td):
    import torch

    import tests._tg_shim as tg_shim

    tg_shim.install_dgl()
    _ref_path()
    from models.diffgraph import DiffGraph as RefDiffGraph

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "gcn_layer": 2, "steps": 5, "noise_scale": 0.1, "noise_min": 0.0001,
        "noise_max": 0.02, "dims": [32], "d_emb_size": 8, "norm": False,
        "dropout": 0.5, "sampling_steps": 0,
    }
    config = Config(
        "DiffGraph", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("DiffGraph")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = {
        "USER_ID_FIELD": "userID", "ITEM_ID_FIELD": "itemID",
        "NEG_PREFIX": "neg_", "train_batch_size": 64, "device": "cpu",
        "end2end": False, "is_multimodal_model": False,
        "embedding_size": 16, "reg_weight": 1e-5, **hp,
    }
    ref = RefDiffGraph(ref_cfg, _DedupedLoader(td))
    ref.eval()

    def copy_dnn(dst, src):
        with torch.no_grad():
            dst.emb_layer.weight.copy_(torch.from_numpy(np.asarray(src["emb_layer"]["w"])))
            dst.emb_layer.bias.copy_(torch.from_numpy(np.asarray(src["emb_layer"]["b"])))
            for d, s in zip(dst.in_layers, src["in_layers"]):
                d.weight.copy_(torch.from_numpy(np.asarray(s["w"])))
                d.bias.copy_(torch.from_numpy(np.asarray(s["b"])))
            for d, s in zip(dst.out_layers, src["out_layers"]):
                d.weight.copy_(torch.from_numpy(np.asarray(s["w"])))
                d.bias.copy_(torch.from_numpy(np.asarray(s["b"])))

    with torch.no_grad():
        ref.embedding_dict["user_emb"].copy_(
            torch.from_numpy(np.asarray(params["user_emb"]))
        )
        ref.embedding_dict["item_emb"].copy_(
            torch.from_numpy(np.asarray(params["item_emb"]))
        )
    copy_dnn(ref.usr_denoiser, params["usr_denoiser"])
    copy_dnn(ref.item_denoiser, params["item_denoiser"])

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefDiffGraph.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )


def test_genrecv1_forward_matches_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    _ref_path()
    _patch_scipy_dok()
    _shim_torch_scatter()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from models.genrecv1 import GenRecV1 as RefGenRecV1

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "n_layers": 2, "keep_rate": 1.0, "sparse_temp": 1.0,
        "temperature": 0.5, "ssl_reg1": 0.01, "ssl_reg2": 0.01,
        "gen_topk": 3, "rebuild_k": 3, "d_emb_size": 8, "nhead": 2,
        "num_layers": 1, "steps": 5, "flip_temp": 1.0,
        "bayesian_samplinge_schedule": True, "sampling_steps": 0,
        "visual_modality": True, "text_modality": True,
        "audio_modality": False, "knn_k": 5,
        "ssl_gen1": 0.1, "ssl_gen2": 0.1, "ssl_gen3": 0.1,
    }
    config = Config(
        "GenRecV1", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, "learning_rate": 1e-3, **hp},
    )
    ours = get_model("GenRecV1")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))
    # deterministic generated UI graph (keep_rate=1: no dropout)
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    topk = jnp.asarray(rng.integers(0, td.n_items, (td.n_users, 3)).astype(np.int32))
    state = {"image_ui": ours.rebuild_ui_graph(topk, jax.random.PRNGKey(7))}

    ref_cfg = _mm_ref_config(
        td, tmp_path, ours,
        {**hp, "reg_weight": 1e-5, "learning_rate": 1e-3},
    )
    ref = RefGenRecV1(ref_cfg, _MockLoader(td))
    # our BN uses batch statistics (the "batch" is always the full node set,
    # so they equal the converged running stats); put the reference in train
    # mode for the same semantics, with every Dropout disabled
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    rec = params["rec"]
    with torch.no_grad():
        copy_t(ref.user_embedding.weight, rec["user_embedding"])
        copy_t(ref.item_id_embedding.weight, rec["item_id_embedding"])
        copy_t(ref.origin_weight, rec["origin_weight"])
        copy_t(ref.generation_weight, rec["generation_weight"])
        copy_t(ref.img_weight, rec["img_weight"])
        copy_t(ref.txt_weight, rec["txt_weight"])
        copy_t(ref.fusion_weight, rec["fusion_weight"])
        copy_t(ref.res_scale, rec["res_scale"])
        for seq, pp in (
            (ref.image_residual_project, rec["image_residual"]),
            (ref.image_modal_project, rec["image_modal"]),
            (ref.text_residual_project, rec["text_residual"]),
            (ref.text_modal_project, rec["text_modal"]),
            (ref.gate_image_modal, rec["gate_image"]),
            (ref.gate_text_modal, rec["gate_text"]),
        ):
            _copy_linear(seq[0], pp["lin"])
            seq[1].weight.copy_(torch.from_numpy(np.asarray(pp["bn"]["g"])))
            seq[1].bias.copy_(torch.from_numpy(np.asarray(pp["bn"]["b"])))
        _copy_linear(ref.caculate_common[0], rec["common1"])
        ref.caculate_common[1].weight.copy_(
            torch.from_numpy(np.asarray(rec["common_bn"]["g"]))
        )
        ref.caculate_common[1].bias.copy_(
            torch.from_numpy(np.asarray(rec["common_bn"]["b"]))
        )
        ref.caculate_common[3].weight.copy_(
            torch.from_numpy(np.asarray(rec["common2"]["w"]))
        )

    # hand the reference the same graphs
    N = td.n_users + td.n_items

    def to_sp(g, shape):
        idx = torch.from_numpy(
            np.stack([np.asarray(g.rows if hasattr(g, "rows") else g["rows"]),
                      np.asarray(g.cols if hasattr(g, "cols") else g["cols"])]).astype(np.int64)
        )
        vals = torch.from_numpy(
            np.asarray(g.vals if hasattr(g, "vals") else g["vals"])
        )
        return torch.sparse_coo_tensor(idx, vals, shape)

    ref.image_UI_matrix = to_sp(state["image_ui"], (N, N))
    ref.image_II_matrix = to_sp(ours.image_II, (td.n_items, td.n_items))
    ref.text_II_matrix = to_sp(ours.text_II, (td.n_items, td.n_items))

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, state, users))
    with torch.no_grad():
        ref_scores = RefGenRecV1.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=2e-3, atol=2e-3
    )


def test_mcdrec_scores_and_unet_match_reference(tiny_td, tmp_path):
    import torch

    _ref_path()
    from models.mcdrec import MCDRec as RefMCDRec

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "lightGCN_n_layers": 2, "lambda_dm": 0.1, "tau": 0.5, "rho": 0.2,
        "steps": 5, "noise_scale": 0.1, "noise_min": 0.0001,
        "noise_max": 0.02, "embedding_size": 16,
    }
    config = Config(
        "MCDRec", "tiny",
        {"save_recommended_topk": False, "reg_weight": 1e-5, **hp},
    )
    ours = get_model("MCDRec")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))
    state = ours.init_state(jax.random.PRNGKey(1))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefMCDRec(ref_cfg, _DedupedLoader(td))
    # batch-stat BN on our side -> reference in train mode (no dropout in
    # the UNet)
    ref.train()

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    with torch.no_grad():
        copy_t(ref.embedding_user.weight, params["user_emb"])
        copy_t(ref.embedding_item.weight, params["item_emb"])
        _copy_linear(ref.v_mlp, params["v_mlp"])
        _copy_linear(ref.t_mlp, params["t_mlp"])
        up = params["unet"]
        for name, blk in (("enc1", ref.unet.enc1), ("enc2", ref.unet.enc2), ("dec1", ref.unet.dec1)):
            p = up[name]
            copy_t(blk[0].weight, p["c1"]["w"]); copy_t(blk[0].bias, p["c1"]["b"])
            copy_t(blk[1].weight, p["bn1"]["g"]); copy_t(blk[1].bias, p["bn1"]["b"])
            copy_t(blk[3].weight, p["c2"]["w"]); copy_t(blk[3].bias, p["c2"]["b"])
            copy_t(blk[4].weight, p["bn2"]["g"]); copy_t(blk[4].bias, p["bn2"]["b"])
        copy_t(ref.unet.final.weight, up["final"]["w"])
        copy_t(ref.unet.final.bias, up["final"]["b"])
        _copy_linear(ref.unet.time_mlp[0], up["time1"])
        _copy_linear(ref.unet.time_mlp[2], up["time2"])

    # (a) LightGCN scores over the initial (full) graph
    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, state, users))
    with torch.no_grad():
        ref_scores = RefMCDRec.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=1e-3, atol=1e-3
    )

    # (b) conditional U-Net forward on fixed inputs
    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 16)).astype(np.float32)
    hv = rng.normal(size=(6, 16)).astype(np.float32)
    ht = rng.normal(size=(6, 16)).astype(np.float32)
    t = np.array([0, 1, 2, 3, 4, 2], np.int32)
    out_o = np.asarray(
        ours.unet_apply(params["unet"], x, t, hv, ht)
    )
    with torch.no_grad():
        out_r = ref.unet(
            torch.from_numpy(x), torch.from_numpy(t.astype(np.int64)),
            torch.from_numpy(hv), torch.from_numpy(ht),
        )
    np.testing.assert_allclose(out_o, out_r.numpy(), rtol=2e-3, atol=2e-3)


def test_rf_velocity_net_matches_reference():
    import torch

    _ref_path()
    from models.rf_modules import SimpleVelocityNet as RefVNet

    from genmmrec_tpu.models.rf_modules import (
        RFConfig,
        apply_velocity,
        init_velocity_net,
    )

    cfg = RFConfig(embedding_dim=16, hidden_dim=32, n_layers=2, dropout=0.1,
                   user_guidance_scale=0.2, guidance_decay_power=2.0,
                   cosine_guidance_scale=0.1, cosine_decay_power=2.0)
    cond_dim = 24
    params = init_velocity_net(jax.random.PRNGKey(0), cfg, cond_dim)

    ref = RefVNet(
        embedding_dim=16, hidden_dim=32, n_layers=2, dropout=0.1,
        condition_dim=cond_dim, user_guidance_scale=0.2,
        guidance_decay_power=2.0, cosine_guidance_scale=0.1,
        cosine_decay_power=2.0,
    )
    with torch.no_grad():
        _copy_linear(ref.time_embed[1], params["time_lin"])
        _copy_linear(ref.condition_encoder[0], params["cond_lin"])
        ref.condition_encoder[1].weight.copy_(torch.from_numpy(np.asarray(params["cond_ln"]["g"])))
        ref.condition_encoder[1].bias.copy_(torch.from_numpy(np.asarray(params["cond_ln"]["b"])))
        _copy_linear(ref.input_proj[0], params["in_lin"])
        ref.input_proj[1].weight.copy_(torch.from_numpy(np.asarray(params["in_ln"]["g"])))
        ref.input_proj[1].bias.copy_(torch.from_numpy(np.asarray(params["in_ln"]["b"])))
        for blk, p in zip(ref.res_blocks, params["res_blocks"]):
            _copy_linear(blk.net[0], p["l1"])
            blk.net[1].weight.copy_(torch.from_numpy(np.asarray(p["ln1"]["g"])))
            blk.net[1].bias.copy_(torch.from_numpy(np.asarray(p["ln1"]["b"])))
            _copy_linear(blk.net[4], p["l2"])
            blk.net[5].weight.copy_(torch.from_numpy(np.asarray(p["ln2"]["g"])))
            blk.net[5].bias.copy_(torch.from_numpy(np.asarray(p["ln2"]["b"])))
        _copy_linear(ref.output_proj[0], params["out_lin1"])
        ref.output_proj[1].weight.copy_(torch.from_numpy(np.asarray(params["out_ln"]["g"])))
        ref.output_proj[1].bias.copy_(torch.from_numpy(np.asarray(params["out_ln"]["b"])))
        _copy_linear(ref.output_proj[4], params["out_lin2"])

    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 16)).astype(np.float32)
    t = rng.random((6, 1)).astype(np.float32)
    cond = rng.normal(size=(6, cond_dim)).astype(np.float32)
    prior = rng.normal(size=(6, 16)).astype(np.float32)
    x1 = rng.normal(size=(6, 16)).astype(np.float32)

    # eval mode: no guidance terms
    ref.eval()
    out_o = np.asarray(apply_velocity(params, cfg, x, t, cond, train=False))
    with torch.no_grad():
        out_r = ref(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond)).numpy()
    np.testing.assert_allclose(out_o, out_r, rtol=1e-4, atol=1e-4)

    # train mode with user-prior + cosine-gradient guidance (dropout off)
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    out_o = np.asarray(
        apply_velocity(params, cfg, x, t, cond, train=True,
                       user_prior=prior, x_1=x1)
    )
    with torch.no_grad():
        out_r = ref(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond),
            user_prior=torch.from_numpy(prior), x_1=torch.from_numpy(x1),
        ).numpy()
    np.testing.assert_allclose(out_o, out_r, rtol=1e-4, atol=1e-4)


def test_codmr_inference_matches_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    _ref_path()
    _patch_scipy_dok()
    _shim_torch_scatter()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from models.codmr import CoDMR as RefCoDMR

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "hide_dim": 16, "emb_size": 10, "steps": 5, "noise_scale": 0.1,
        "noise_min": 0.0001, "noise_max": 0.02, "mean_type": "x0",
        "norm": False, "mlp_act_func": "tanh", "knn_k": 5,
        "sampling_steps": 0, "uiLayers": 2, "au_uiLayers": 2,
        "reweight": False, "elbo_weight": 0.1, "ssl_temp": 0.1,
        "ssl_reg": 0.01, "di_pre_weight": 0.5, "con_fe_weight": 0.1,
        "mlp_dims": [8], "reg": 0.01, "noise_schedule": "linear",
        "mean_typeNon": "x0", "learning_rate": 1e-3,
    }
    config = Config(
        "CoDMR", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("CoDMR")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, {**hp, "latent_size": 16})
    ref = RefCoDMR(ref_cfg, _DedupedLoader(td))
    ref.eval()

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    with torch.no_grad():
        copy_t(ref.embedding_dict["user_emb"], params["user_emb"])
        copy_t(ref.embedding_dict["item_emb"], params["item_emb"])
        copy_t(ref.embedding_dict["uinterest_emb"], params["uinterest_emb"])
        copy_t(ref.user_emb_text, params["user_emb_text"])
        ref.item_text_net.weight.copy_(
            torch.from_numpy(np.asarray(params["item_text_net"]["w"]))
        )
        _copy_linear(ref.encodecon1[0], params["encodecon1"]["l1"])
        _copy_linear(ref.encodecon1[2], params["encodecon1"]["l2"])
        _copy_linear(ref.encodecon2[0], params["encodecon2"]["l1"])
        _copy_linear(ref.encodecon2[2], params["encodecon2"]["l2"])
        # Nodenoiser
        non = params["non"]
        _copy_linear(ref.Nonmodel.emb_layer, non["emb_layer"])
        _copy_linear(ref.Nonmodel.in_layers[0], non["in"])
        ref.Nonmodel.norm1.weight.copy_(torch.from_numpy(np.asarray(non["ln"]["g"])))
        ref.Nonmodel.norm1.bias.copy_(torch.from_numpy(np.asarray(non["ln"]["b"])))
        _copy_linear(ref.Nonmodel.out_layers[0], non["out"])
        # cdenosier
        cdn = params["cdn"]
        _copy_linear(ref.cdnmodel.emb_layer, cdn["emb_layer"])
        _copy_linear(ref.cdnmodel.in_layers[0], cdn["in"])
        ref.cdnmodel.norm2.weight.copy_(torch.from_numpy(np.asarray(cdn["ln2"]["g"])))
        ref.cdnmodel.norm2.bias.copy_(torch.from_numpy(np.asarray(cdn["ln2"]["b"])))
        _copy_linear(ref.cdnmodel.out_layers[0], cdn["out"])
        _copy_linear(ref.cdnmodel.in_layers1[0], cdn["in1"])
        ref.cdnmodel.norm1.weight.copy_(torch.from_numpy(np.asarray(cdn["ln1"]["g"])))
        ref.cdnmodel.norm1.bias.copy_(torch.from_numpy(np.asarray(cdn["ln1"]["b"])))
        _copy_linear(ref.cdnmodel.out_layers1[0], cdn["out1"])
        # the reference's item text features: our t_feat verbatim
        # (copied via the feature files already)

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, {}, users))
    with torch.no_grad():
        ref_scores = RefCoDMR.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=2e-3, atol=2e-3
    )


def test_mvdiff_forward_matches_reference(tiny_td, tmp_path, monkeypatch):
    import torch

    _ref_path()
    _patch_scipy_dok()
    _shim_torch_scatter()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    from models.mvdiff import MVDiff as RefMVDiff

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    td = tiny_td
    hp = {
        "gcn_layer_num": 2, "keep_rate": 1.0, "modal_fusion": True,
        "ssl_reg": 0.01, "temperature": 0.7, "sparse_temp": 0.2,
        "noise_scale": 0.1, "noise_min": 0.0001, "noise_max": 0.02,
        "steps": 5, "d_emb_size": 10, "norm": False,
        "sampling_steps": 0, "sampling_noise": False, "rebuild_k": 3,
        "high_order_topk": 2, "knn_k": 5,
    }
    config = Config(
        "MVDiff", "tiny",
        {"save_recommended_topk": False, "embedding_size": 16,
         "reg_weight": 1e-5, **hp},
    )
    ours = get_model("MVDiff")(config, td)
    params = ours.init_params(jax.random.PRNGKey(0))
    state = ours.init_state(jax.random.PRNGKey(1))

    ref_cfg = _mm_ref_config(td, tmp_path, ours, hp)
    ref = RefMVDiff(ref_cfg, _MockLoader(td))
    # batch-stat BN semantics (see GenRecV1 test)
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    def copy_t(t, arr):
        with torch.no_grad():
            t.data.copy_(torch.from_numpy(np.asarray(arr)))

    def copy_stack(seq, stack):
        lins = [m for m in seq if isinstance(m, torch.nn.Linear)]
        bns = [m for m in seq if isinstance(m, torch.nn.BatchNorm1d)]
        assert len(lins) == len(stack)
        for lin, bn, p in zip(lins, bns, stack):
            _copy_linear(lin, p["lin"])
            bn.weight.data.copy_(torch.from_numpy(np.asarray(p["bn"]["g"])))
            bn.bias.data.copy_(torch.from_numpy(np.asarray(p["bn"]["b"])))

    rec = params["rec"]
    with torch.no_grad():
        copy_t(ref.user_embedding.weight, rec["user_embedding"])
        copy_t(ref.item_id_embedding.weight, rec["item_id_embedding"])
        copy_stack(ref.image_residual_project, rec["image_residual"])
        copy_stack(ref.image_modal_project, rec["image_modal"])
        copy_stack(ref.text_residual_project, rec["text_residual"])
        copy_stack(ref.text_modal_project, rec["text_modal"])
        copy_stack(ref.gate_image_modal, [rec["gate_image"]])
        copy_stack(ref.gate_text_modal, [rec["gate_text"]])
        _copy_linear(ref.caculate_common[0], rec["common1"]["lin"])
        ref.caculate_common[1].weight.copy_(
            torch.from_numpy(np.asarray(rec["common1"]["bn"]["g"]))
        )
        ref.caculate_common[1].bias.copy_(
            torch.from_numpy(np.asarray(rec["common1"]["bn"]["b"]))
        )
        ref.caculate_common[3].weight.copy_(
            torch.from_numpy(np.asarray(rec["common2"]["w"]))
        )

    N = td.n_users + td.n_items

    def to_sp(g, shape):
        idx = torch.from_numpy(
            np.stack([np.asarray(g["rows"]), np.asarray(g["cols"])]).astype(np.int64)
        )
        return torch.sparse_coo_tensor(
            idx, torch.from_numpy(np.asarray(g["vals"])), shape
        )

    I = td.n_items
    # halve each UI matrix: our forward adds image+text UI separately, the
    # reference sums them first — identical since spmm is linear
    ref.image_UI_matrix = to_sp(state["image_ui"], (N, N))
    ref.text_UI_matrix = to_sp(state["text_ui"], (N, N))
    ref.image_II_matrix = to_sp(state["image_ii"], (I, I))
    ref.text_II_matrix = to_sp(state["text_ii"], (I, I))
    ref.modal_fusion_II_matrix = to_sp(state["fusion_ii"], (I, I))

    users = np.asarray(td.users[:8])
    ours_scores = np.asarray(ours.scores(params, state, users))
    with torch.no_grad():
        ref_scores = RefMVDiff.full_sort_predict(
            ref, [torch.from_numpy(users.astype(np.int64))]
        )
    np.testing.assert_allclose(
        ours_scores, ref_scores.numpy(), rtol=2e-3, atol=2e-3
    )
