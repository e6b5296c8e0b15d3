"""Diffusion stack tests: schedule golden values vs numpy float64 reference,
sampler shape/finiteness, importance-buffer semantics, DiffRec smoke."""

import numpy as np
import pytest


def test_schedule_matches_reference_formulas():
    import jax.numpy as jnp

    from genmmrec_tpu.models.diffusion import make_schedule

    steps, scale, nmin, nmax = 20, 0.0001, 0.0001, 0.02
    s = make_schedule("linear", scale, nmin, nmax, steps)

    betas = np.linspace(scale * nmin, scale * nmax, steps, dtype=np.float64)
    betas[0] = 0.00001
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-6)
    post_var = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(s.posterior_variance), post_var, rtol=1e-5)
    coef1 = betas * np.sqrt(acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(s.posterior_mean_coef1), coef1, rtol=1e-5)


def test_linear_var_schedule():
    from genmmrec_tpu.models.diffusion import make_schedule
    from genmmrec_tpu.models.diffusion.schedule import betas_from_linear_variance

    steps = 10
    var = np.linspace(5e-8, 5e-7, steps)
    betas = betas_from_linear_variance(steps, var)
    assert betas.shape == (steps,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    s = make_schedule("linear-var", 0.0001, 0.0005, 0.005, steps)
    assert np.isfinite(np.asarray(s.posterior_log_variance_clipped)).all()


def test_q_sample_statistics():
    import jax
    import jax.numpy as jnp

    from genmmrec_tpu.models.diffusion import make_schedule, q_sample

    s = make_schedule("linear", 1.0, 0.01, 0.5, 50)
    x0 = jnp.ones((512, 16))
    t = jnp.full((512,), 49, jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    xt = q_sample(s, x0, t, noise)
    # at the final step the signal is heavily attenuated
    sa = float(s.sqrt_alphas_cumprod[49])
    assert abs(float(xt.mean()) - sa) < 0.05


def test_p_sample_identity_denoiser():
    """With a denoiser that returns the true x0, the chain converges to x0."""
    import jax.numpy as jnp

    from genmmrec_tpu.models.diffusion import make_schedule, p_sample_loop

    s = make_schedule("linear", 0.0001, 0.0001, 0.02, 10)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))
    out = p_sample_loop(s, lambda x, t: x0, x0, q_steps=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_importance_buffer_fills_then_importance_samples():
    import jax
    import jax.numpy as jnp

    from genmmrec_tpu.models.diffusion import (
        init_lt_state,
        sample_timesteps,
        update_lt_state,
    )

    steps, H = 4, 3
    st = init_lt_state(steps, H)
    # uniform until full
    t, pt = sample_timesteps(jax.random.PRNGKey(0), st, 64, method="importance")
    assert np.allclose(np.asarray(pt), 1.0)
    # fill the buffer
    for i in range(6):
        ts = jnp.arange(64) % steps
        st = update_lt_state(st, ts, jnp.ones(64) * (ts + 1))
    assert (np.asarray(st["Lt_count"]) == H).all()
    t, pt = sample_timesteps(jax.random.PRNGKey(1), st, 4096, method="importance")
    # higher-loss timesteps sampled more often
    counts = np.bincount(np.asarray(t), minlength=steps)
    assert counts[3] > counts[0]
    assert not np.allclose(np.asarray(pt), 1.0)


def test_diffrec_end_to_end():
    import jax

    from genmmrec_tpu.config import Config
    from genmmrec_tpu.data.arrays import build_eval_data, build_train_data
    from genmmrec_tpu.data.dataset import RecDataset
    from genmmrec_tpu.engine.trainer import Trainer
    from genmmrec_tpu.models import get_model

    config = Config(
        "DiffRec", "tiny", {"epochs": 3, "save_recommended_topk": False, "stopping_step": 50}
    )
    ds = RecDataset(config)
    train_ds, valid_ds, test_ds = ds.split()
    td = build_train_data(train_ds)
    vd = build_eval_data(valid_ds, train_ds, int(config["eval_batch_size"]))
    model = get_model("DiffRec")(config, td)
    trainer = Trainer(config, model)
    best, valid, _ = trainer.fit(td, vd, vd, saved=False, verbose=False)
    losses = [trainer.train_loss_dict[e] for e in sorted(trainer.train_loss_dict)]
    assert all(np.isfinite(l) for l in losses)
    assert "recall@20" in valid
