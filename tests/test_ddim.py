"""DDIM schedule unit tests against closed-form algebra."""

import jax.numpy as jnp
import numpy as np

from mikudance_tpu.diffusion import ddim


def test_linear_betas_endpoints():
    betas = ddim.make_betas(1000, 0.00085, 0.012, "linear")
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085)
    np.testing.assert_allclose(betas[-1], 0.012)


def test_scaled_linear_betas():
    betas = ddim.make_betas(1000, 0.00085, 0.012, "scaled_linear")
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # interior point is the square of the sqrt-space linspace
    sqrt_space = np.linspace(0.00085**0.5, 0.012**0.5, 1000)
    np.testing.assert_allclose(betas, sqrt_space**2, rtol=1e-12)


def test_zero_snr_terminal():
    sched = ddim.DDIMSchedule.create(rescale_betas_zero_snr=True)
    a = np.asarray(sched.alphas_cumprod)
    assert a[-1] == 0.0  # terminal SNR exactly zero
    # first alpha_bar preserved by the rescale
    betas = ddim.make_betas()
    np.testing.assert_allclose(a[0], 1.0 - betas[0], rtol=1e-5)
    # SNR at terminal timestep is zero
    assert float(sched.snr(jnp.array(999))) == 0.0


def test_trailing_timesteps():
    sched = ddim.DDIMSchedule.create()
    ts = sched.timesteps(20, "trailing")
    assert ts[0] == 999 and ts[-1] == 49
    assert len(ts) == 20
    np.testing.assert_array_equal(np.diff(ts), -50)


def test_step_pairs():
    sched = ddim.DDIMSchedule.create()
    ts, prev = ddim.inference_step_pairs(sched, 20)
    np.testing.assert_array_equal(prev, ts - 50)
    assert prev[-1] == -1  # final step targets alpha_bar = 1 (clean sample)


def test_v_prediction_step_roundtrip():
    """If the model predicts the exact velocity for (x0, eps), DDIM must land on
    sqrt(a_prev) x0 + sqrt(1-a_prev) eps — closed form."""
    sched = ddim.DDIMSchedule.create()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), dtype=jnp.float32)

    t = jnp.array(499)
    tp = jnp.array(449)
    a_t = sched.alphas_cumprod[499]
    a_p = sched.alphas_cumprod[449]

    xt = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps
    v = jnp.sqrt(a_t) * eps - jnp.sqrt(1 - a_t) * x0
    x_prev = sched.step(v, t, tp, xt)

    expected = jnp.sqrt(a_p) * x0 + jnp.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expected), atol=1e-5)


def test_epsilon_step_matches_v_step():
    """epsilon- and v-parameterized steps agree when fed consistent predictions."""
    sv = ddim.DDIMSchedule.create(prediction_type="v_prediction")
    se = ddim.DDIMSchedule.create(prediction_type="epsilon")
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(4, 4)), dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(4, 4)), dtype=jnp.float32)
    t, tp = jnp.array(700), jnp.array(650)
    a_t = sv.alphas_cumprod[700]
    xt = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps
    v = jnp.sqrt(a_t) * eps - jnp.sqrt(1 - a_t) * x0
    np.testing.assert_allclose(
        np.asarray(sv.step(v, t, tp, xt)),
        np.asarray(se.step(eps, t, tp, xt)),
        atol=1e-5,
    )


def test_add_noise_get_velocity_consistency():
    sched = ddim.DDIMSchedule.create(beta_schedule="scaled_linear")
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(3, 5, 5, 4)), dtype=jnp.float32)
    noise = jnp.asarray(rng.normal(size=(3, 5, 5, 4)), dtype=jnp.float32)
    t = jnp.array([0, 500, 999])
    xt = sched.add_noise(x0, noise, t)
    v = sched.get_velocity(x0, noise, t)
    a = np.asarray(sched.alphas_cumprod)[np.asarray(t)][:, None, None, None]
    np.testing.assert_allclose(
        np.asarray(xt), np.sqrt(a) * np.asarray(x0) + np.sqrt(1 - a) * np.asarray(noise),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(v), np.sqrt(a) * np.asarray(noise) - np.sqrt(1 - a) * np.asarray(x0),
        atol=1e-5,
    )
    # terminal timestep: x_t is pure noise under zero-SNR
    np.testing.assert_allclose(np.asarray(xt)[2], np.asarray(noise)[2], atol=1e-6)


def test_min_snr_weights():
    sched = ddim.DDIMSchedule.create(beta_schedule="scaled_linear")
    t = jnp.array([10, 500, 999])
    w_v = ddim.min_snr_loss_weight(sched, t, 5.0, "v_prediction")
    snr = np.asarray(sched.snr(t))
    np.testing.assert_allclose(
        np.asarray(w_v), np.minimum(snr, 5.0) / (snr + 1.0), rtol=1e-6
    )
    # zero-SNR terminal: v weight is 0/(0+1) = 0
    assert np.asarray(w_v)[2] == 0.0
