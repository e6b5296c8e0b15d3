"""Model-axis sharding in the REAL fit path (VERDICT r1 item #3).

Runs on the 8-virtual-device CPU mesh from conftest. Asserts that a
``mesh_shape: {data: 2, model: 4}`` run — embedding tables row-sharded,
batches data-sharded, eval top-k merged across item shards — reproduces the
single-device metrics of an identical fit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _fit(model_name, mesh_shape, topk=(5, 10)):
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.trainer import Trainer
    from genmmrec_tpu.models import get_model

    overrides = {
        "epochs": 2,
        "save_recommended_topk": False,
        "hyper_parameters": ["seed"],
        "topk": list(topk),
        "metrics": ["Recall", "NDCG"],
        "valid_metric": f"Recall@{max(topk)}",
    }
    if mesh_shape is not None:
        overrides["mesh_shape"] = mesh_shape
    config = Config(model_name, "tiny", overrides)
    ds = RecDataset(config)
    train, valid, test = ds.split()
    td = build_train_data(train)
    ebs = int(config["eval_batch_size"])
    vd = build_eval_data(valid, train, ebs)
    sd = build_eval_data(test, train, ebs)
    model = get_model(model_name)(config, td)
    trainer = Trainer(config, model)
    score, valid_res, test_res = trainer.fit(td, vd, sd)
    return score, valid_res, test_res, trainer.params


@pytest.mark.parametrize("model_name", ["BPR", "LightGCN"])
def test_model_sharded_fit_matches_single_device(model_name):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    s_ref, v_ref, t_ref, p_ref = _fit(model_name, None)
    s_sh, v_sh, t_sh, p_sh = _fit(model_name, {"data": 2, "model": 4})

    # trained parameters equal up to collective reduction order
    for a, b in zip(
        jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_sh)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)

    assert np.isclose(s_ref, s_sh, atol=2e-3), (s_ref, s_sh)
    for k in v_ref:
        assert np.isclose(v_ref[k], v_sh[k], atol=2e-3), (k, v_ref[k], v_sh[k])
    for k in t_ref:
        assert np.isclose(t_ref[k], t_sh[k], atol=2e-3), (k, t_ref[k], t_sh[k])


def test_sharded_params_actually_sharded():
    """The fit path must place qualifying tables on the model axis (not
    silently replicate)."""
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.models import get_model
    from genmmrec_tpu.parallel.mesh import build_mesh, shard_model_params

    config = Config(
        "BPR", "tiny", {"mesh_shape": {"data": 2, "model": 4},
                        "save_recommended_topk": False},
    )
    ds = RecDataset(config)
    train, _, _ = ds.split()
    td = build_train_data(train)
    model = get_model("BPR")(config, td)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = build_mesh(config)
    sharded = shard_model_params(model, params, mesh)
    specs = {
        k: str(v.sharding.spec) for k, v in sharded.items() if hasattr(v, "sharding")
    }
    n_row_sharded = sum("model" in s for s in specs.values())
    assert n_row_sharded >= 2, specs  # user AND item tables


def test_diffusion_item_sharding_placement():
    """Item-sharded diffusion path (SURVEY hard part #4): the denoiser
    out-projection (n_items, hidden) and its bias (n_items,) must land on
    the model axis so the (B, n_items) interaction vectors stay sharded
    end-to-end through the DNN."""
    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.models import get_model
    from genmmrec_tpu.parallel.mesh import build_mesh, item_sharded, shard_model_params

    config = Config(
        "DiffRec", "tiny", {"mesh_shape": {"data": 2, "model": 4},
                            "save_recommended_topk": False},
    )
    ds = RecDataset(config)
    train, _, _ = ds.split()
    td = build_train_data(train)
    model = get_model("DiffRec")(config, td)
    assert model.n_items % 4 == 0, "tiny catalog must split over model=4"
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = build_mesh(config)
    sharded = shard_model_params(model, params, mesh)
    out_w = sharded["dnn"]["out_layers"][-1]["w"]
    out_b = sharded["dnn"]["out_layers"][-1]["b"]
    assert out_w.shape[0] == model.n_items
    assert "model" in str(out_w.sharding.spec), out_w.sharding
    assert "model" in str(out_b.sharding.spec), out_b.sharding

    # the activation constraint itself: (B, n_items) lays its last axis on
    # the model axis, and a no-op off-mesh
    x = model.interaction_vectors(jnp.arange(8, dtype=jnp.int32))
    xs = jax.jit(lambda a: item_sharded(a, mesh))(x)
    assert "model" in str(xs.sharding.spec), xs.sharding
    np.testing.assert_array_equal(np.asarray(x), np.asarray(xs))
    assert item_sharded(x, None) is x


def test_item_sharding_at_real_elec_width():
    """VERDICT r3 #7: the (B, n_items) denoiser activations must actually
    partition over ``model`` AT THE REAL WIDTH — elec n_items = 63001 = 251²
    is NOT a multiple of any axis size, so this pins the uneven-sharding
    path (GSPMD pads the last shard) for the GenRecV1/DiffRec flip/DDPM
    vectors, not just a divisible toy width."""
    from jax.sharding import Mesh

    from genmmrec_tpu.parallel.mesh import item_sharded, sharded_topk

    n_items = 63001
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model"))

    seen = {}

    def record(name):
        def cb(sharding):
            seen[name] = str(sharding.spec)

        return cb

    @jax.jit
    def denoiser_like(x, w):
        x = item_sharded(x, mesh)
        jax.debug.inspect_array_sharding(x, callback=record("x"))
        h = x @ w  # in-projection: local partial products + psum
        logits = h @ w.T  # out-projection back to catalog width
        logits = item_sharded(logits, mesh)
        jax.debug.inspect_array_sharding(logits, callback=record("logits"))
        return logits

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, n_items)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n_items, 16)).astype(np.float32) * 0.01)
    out = denoiser_like(x, w)
    assert out.shape == (8, n_items)
    assert "model" in seen["x"], seen
    assert "model" in seen["logits"], seen

    # sharded eval top-k at the same uneven width merges to the exact result
    v_ref, i_ref = jax.lax.top_k(x, 20)
    v_sh, i_sh = jax.jit(lambda s: sharded_topk(s, 20, mesh))(x)
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_sh), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))


def test_genrecv1_flip_phase_item_sharded():
    """The GenRecV1 flip-diffusion q_sample→denoise→p_sample chain keeps its
    (B, n_items) tensors partitioned over ``model`` when constrained by the
    trainer's user_vectors hook (diffusion_trainers.py)."""
    from jax.sharding import Mesh

    from genmmrec_tpu.models.diffusion import flip as flipd
    from genmmrec_tpu.models.modal_denoise import (
        apply_modal_denoise,
        init_modal_denoise,
    )
    from genmmrec_tpu.parallel.mesh import item_sharded

    n_items = 1251  # odd width: uneven shards over model=4
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    dn = init_modal_denoise(jax.random.PRNGKey(0), n_items, n_items, 10, 2, 2)

    seen = {}

    @jax.jit
    def phase(x, key):
        x = item_sharded(x, mesh)
        k_q, k_p = jax.random.split(key)
        t = jnp.zeros((x.shape[0],), jnp.int32)
        x_t = item_sharded(flipd.q_sample(k_q, x, t, 5), mesh)
        jax.debug.inspect_array_sharding(
            x_t, callback=lambda s: seen.setdefault("x_t", str(s.spec))
        )
        logits = item_sharded(apply_modal_denoise(dn, x_t, t), mesh)
        jax.debug.inspect_array_sharding(
            logits, callback=lambda s: seen.setdefault("logits", str(s.spec))
        )
        return logits.sum()

    x = (jax.random.uniform(jax.random.PRNGKey(1), (8, n_items)) < 0.01).astype(
        jnp.float32
    )
    out = phase(x, jax.random.PRNGKey(2))
    assert np.isfinite(float(out))
    assert "model" in seen["x_t"], seen
    assert "model" in seen["logits"], seen


def test_sharded_topk_matches_plain():
    from genmmrec_tpu.parallel.mesh import build_mesh, sharded_topk

    mesh = build_mesh(None, devices=jax.devices()[:8])  # 8-way data axis
    # reshape to put 4 devices on model: build explicitly
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))

    v_ref, i_ref = jax.lax.top_k(scores, 7)
    v_sh, i_sh = jax.jit(lambda s: sharded_topk(s, 7, mesh))(scores)
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_sh), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_sh))
