"""Rectified-Flow module + RFGUME/RFMRec integration tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_td():
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset

    config = Config("BPR", "tiny", {"save_recommended_topk": False})
    ds = RecDataset(config)
    train_ds, valid_ds, _ = ds.split()
    return train_ds, valid_ds, build_train_data(train_ds)


def test_rf_straight_path_loss_decreases():
    """RF learns the identity flow for a fixed target distribution."""
    import optax

    from genmmrec_tpu.models import rf_modules as rf

    cfg = rf.RFConfig(embedding_dim=8, hidden_dim=32, n_layers=1, n_users=4, n_items=12,
                      infonce_negative_samples=4, contrast_weight=0.0, dropout=0.0)
    key = jax.random.PRNGKey(0)
    params = rf.init_velocity_net(key, cfg, condition_dim=8)
    target = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    cond = jax.random.normal(jax.random.PRNGKey(2), (16, 8))
    bu = jnp.arange(4) % 4
    bp = jnp.arange(4) % 12
    w = jnp.ones(4)

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        def loss_fn(p):
            total, rf_l, cl = rf.rf_losses(p, cfg, k, target, cond, None, bu, bp, w)
            return total

        l, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l

    losses = []
    for i in range(60):
        params, opt_state, l = step(params, opt_state, jax.random.PRNGKey(10 + i))
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.8


def test_rf_generate_shapes_and_determinism():
    from genmmrec_tpu.models import rf_modules as rf

    cfg = rf.RFConfig(embedding_dim=8, hidden_dim=32, n_layers=1, sampling_steps=5)
    params = rf.init_velocity_net(jax.random.PRNGKey(0), cfg, condition_dim=8)
    cond = jax.random.normal(jax.random.PRNGKey(1), (6, 8))
    out1 = rf.generate(params, cfg, jax.random.PRNGKey(2), cond)
    out2 = rf.generate(params, cfg, jax.random.PRNGKey(2), cond)
    assert out1.shape == (6, 8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # reflow pairing: z1 = generate(z0)
    z0, z1 = rf.prepare_reflow(params, cfg, jax.random.PRNGKey(3), cond)
    z1b = rf.generate(params, cfg, jax.random.PRNGKey(9), cond, start_noise=z0)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z1b), rtol=1e-5)


@pytest.mark.parametrize(
    "name",
    [
        "RFGUME",
        "RFGUMETime",
        "RFMRec",
        "RFBM3",
        "RFFREEDOM",
        "RFLATTICE",
        "RFMGCN",
        "RFMMGCN",
        "RFVBPR",
        "RFLGMRec",
        "RFBPR_remove",
        "RFLightGCN_remove",
        "RFLayerGCN_remove",
        "RFDualGNN",
        "RFGRCN",
        "RFCOHESION",
        "RFSMORE",
        "RFPGL",
    ],
)
def test_rf_model_contract(tiny_td, name):
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    _, _, td = tiny_td
    config = Config(name, "tiny", {"save_recommended_topk": False, "rf_loss_weight": 0.2})
    model = get_model(name)(config, td)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    state = model.init_state(key)
    state = model.pre_epoch(params, state, jax.random.PRNGKey(1), 0)
    B = 16
    batch = {
        "users": td.users[:B],
        "pos": td.items[:B],
        "neg": (td.items[:B] + 1) % td.n_items,
        "weight": np.ones(B, np.float32),
    }
    total, _ = model.loss(params, state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: model.loss(p, state, batch, jax.random.PRNGKey(2))[0])(params)
    gnorm = sum(float((g**2).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    scores = model.scores(params, state, td.users[:4])
    assert scores.shape == (4, td.n_items)
    assert np.isfinite(np.asarray(scores)).all()


def test_rfgumetime_temporal_flow(tiny_td):
    """Temporal variant: historical graph is a strict edge subset; RF source
    X0 equals the historical conv; convex inference mixing."""
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    _, _, td = tiny_td
    config = Config(
        "RFGUMETime",
        "tiny",
        {"save_recommended_topk": False, "rf_loss_weight": 0.2, "temporal_ratio": 0.4},
    )
    model = get_model("RFGUMETime")(config, td)
    assert model.historical_adj is not None
    assert model.historical_adj.nnz < model.norm_adj.nnz
    params = model.init_params(jax.random.PRNGKey(0))
    x0 = model._rf_x0(params)
    expected = model._conv_ui(
        model.historical_adj, params["user_embedding"], params["item_id_embedding"]
    )
    np.testing.assert_allclose(np.asarray(x0), np.asarray(expected), rtol=1e-6)
    # temporal_ratio=0 degrades to the Gaussian-source RFGUME
    config0 = Config(
        "RFGUMETime",
        "tiny",
        {"save_recommended_topk": False, "rf_loss_weight": 0.2, "temporal_ratio": 0.0},
    )
    model0 = get_model("RFGUMETime")(config0, td)
    assert model0.historical_adj is None and model0._rf_x0(params) is None


def test_rf_inference_mix_activates_after_warmup(tiny_td):
    """VERDICT r2 weak #5: the RF-generated component must actually reach the
    scoring path once past warmup. Pre-warmup scores equal the use_rf=False
    host exactly; post-warmup they must differ (mixing active)."""
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    _, _, td = tiny_td
    mk = lambda **kw: Config(
        "RFGUME", "tiny",
        {"save_recommended_topk": False, "rf_loss_weight": 0.2,
         "rf_warmup_epochs": 3, **kw},
    )
    model = get_model("RFGUME")(mk(), td)
    base = get_model("RFGUME")(mk(use_rf=False), td)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    base_params = base.init_params(key)  # same k_host split -> same host tree
    users = td.users[:8]

    pre = model.pre_epoch(params, model.init_state(key), jax.random.PRNGKey(1), 1)
    post = model.pre_epoch(params, model.init_state(key), jax.random.PRNGKey(1), 3)
    s_pre = np.asarray(model.scores(params, pre, users))
    s_post = np.asarray(model.scores(params, post, users))
    s_base = np.asarray(base.scores(base_params, base.init_state(key), users))
    np.testing.assert_allclose(s_pre, s_base, rtol=1e-6)
    assert not np.allclose(s_post, s_base), (
        "post-warmup scores identical with/without RF — generated component "
        "never reached the scoring path"
    )


def test_rfgumetime_diverges_from_rfgume_post_warmup(tiny_td):
    """temporal_ratio changes the RF flow's X0/conditions, so RFGUMETime must
    produce different post-warmup scores than RFGUME from the same init
    (byte-identical metrics in the round-2 sweep meant RF never activated)."""
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    _, _, td = tiny_td
    common = {"save_recommended_topk": False, "rf_loss_weight": 0.2,
              "rf_warmup_epochs": 2}
    m_g = get_model("RFGUME")(Config("RFGUME", "tiny", dict(common)), td)
    m_t = get_model("RFGUMETime")(
        Config("RFGUMETime", "tiny", dict(common, temporal_ratio=0.3)), td
    )
    key = jax.random.PRNGKey(0)
    p_g, p_t = m_g.init_params(key), m_t.init_params(key)
    st_g = m_g.pre_epoch(p_g, m_g.init_state(key), jax.random.PRNGKey(1), 2)
    st_t = m_t.pre_epoch(p_t, m_t.init_state(key), jax.random.PRNGKey(1), 2)
    users = td.users[:8]
    s_g = np.asarray(m_g.scores(p_g, st_g, users))
    s_t = np.asarray(m_t.scores(p_t, st_t, users))
    assert not np.allclose(s_g, s_t), (
        "RFGUMETime with temporal_ratio=0.3 scored identically to RFGUME "
        "post-warmup — the temporal X0/conditions are inert"
    )


def test_rfgume_rf_params_use_dedicated_adamw(tiny_td):
    """RF subtree must be updated by its own AdamW even though the main
    chain freezes nothing else."""
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.engine.trainer import Trainer
    from genmmrec_tpu.models import get_model

    train_ds, valid_ds, td = tiny_td
    config = Config(
        "RFGUME", "tiny", {"save_recommended_topk": False, "rf_loss_weight": 0.2, "epochs": 1}
    )
    model = get_model("RFGUME")(config, td)
    trainer = Trainer(config, model)
    params = model.init_params(jax.random.PRNGKey(0))
    state = model.init_state(jax.random.PRNGKey(1))
    trainer._state = state
    _, train_epoch = trainer._build_train_step(td)
    opt = trainer._make_optimizer()
    opt_state = opt.init(params)
    before_rf = np.asarray(params["rf"]["in_lin"]["w"]).copy()
    before_main = np.asarray(params["user_embedding"]).copy()
    new_params, _, _, _ = train_epoch(params, opt_state, state, jax.random.PRNGKey(2))
    assert not np.allclose(before_rf, np.asarray(new_params["rf"]["in_lin"]["w"]))
    assert not np.allclose(before_main, np.asarray(new_params["user_embedding"]))


def test_2rf_stage_transition(tiny_td):
    """use_2rf: before the transition the RF trains noise->target; after it
    trains reflow pairs and generates in one step. Both stages must produce
    finite losses/gradients and scores."""
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.models import get_model

    _, _, td = tiny_td
    config = Config(
        "RFBM3", "tiny",
        {"save_recommended_topk": False, "rf_loss_weight": 0.2,
         "use_2rf": True, "rf_2rf_transition_epoch": 2},
    )
    model = get_model("RFBM3")(config, td)
    params = model.init_params(jax.random.PRNGKey(0))
    B = 16
    batch = {
        "users": td.users[:B], "pos": td.items[:B],
        "neg": (td.items[:B] + 1) % td.n_items,
        "weight": np.ones(B, np.float32),
    }
    losses = []
    for epoch in (0, 5):  # stage 1 and stage 2
        state = model.pre_epoch(params, model.init_state(jax.random.PRNGKey(1)),
                                jax.random.PRNGKey(2), epoch)
        total, _ = model.loss(params, state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(total))
        losses.append(float(total))
        g = jax.grad(lambda p: model.loss(p, state, batch, jax.random.PRNGKey(3))[0])(params)
        gn = sum(float((x**2).sum()) for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gn) and gn > 0
        scores = model.scores(params, state, td.users[:4])
        assert np.isfinite(np.asarray(scores)).all()
    # the two stages optimize different targets
    assert losses[0] != losses[1]
