"""Golden pin of DiffusionSchedule against diffusers 0.16 constants.

The reference loads its schedulers from the published x4-upscaler pipeline
through diffusers==0.16 (reference requirements.txt:7;
stable_diffusion_guidance_sr.py:149-158 reads ``scheduler.alphas_cumprod``,
:287-310 noises the LR condition with ``low_res_scheduler.add_noise``).
diffusers cannot be installed here, so the expected values below are
hand-transcribed from the diffusers 0.16 scheduling math (scaled_linear:
``betas = linspace(sqrt(b0), sqrt(b1), N)**2``; DDIM 'leading' timestep
spacing with ``steps_offset``; ``set_alpha_to_one=false`` final alpha) and
pinned as literal constants — if DiffusionSchedule ever drifts from them, a
real checkpoint drop-in would silently corrupt generate_sr/SDS.

x4-upscaler scheduler config: num_train_timesteps=1000, beta_start=0.0001,
beta_end=0.02, beta_schedule='scaled_linear', steps_offset=1,
set_alpha_to_one=false, prediction_type='epsilon'.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from trinerflet_tpu.sr.guidance import DiffusionSchedule


# diffusers 0.16, DDIMScheduler(beta_start=1e-4, beta_end=0.02,
# beta_schedule="scaled_linear", num_train_timesteps=1000):
#   betas = torch.linspace(1e-4**0.5, 0.02**0.5, 1000) ** 2
#   alphas_cumprod = cumprod(1 - betas)
# Spot values computed from that formula in float64:
GOLDEN_BETAS = {0: 1.0e-4, 1: 1.0264836e-4, 999: 2.0e-2}
GOLDEN_ALPHAS_CUMPROD = {
    0: 0.99990000,
    20: 0.99730128,
    500: 0.33127458,
    999: 7.3341246e-4,
}


class TestScheduleConstants:
    def setup_method(self):
        self.sch = DiffusionSchedule(1000)

    def test_betas(self):
        for i, v in GOLDEN_BETAS.items():
            assert float(self.sch.betas[i]) == pytest.approx(v, rel=1e-5), i

    def test_alphas_cumprod(self):
        for i, v in GOLDEN_ALPHAS_CUMPROD.items():
            assert float(self.sch.alphas_cumprod[i]) == pytest.approx(
                v, rel=1e-4
            ), i

    def test_final_alpha_set_alpha_to_one_false(self):
        # x4-upscaler config: set_alpha_to_one=false -> alphas_cumprod[0]
        assert float(self.sch.final_alpha_cumprod) == pytest.approx(
            0.9999, rel=1e-6
        )
        assert float(DiffusionSchedule(1000, set_alpha_to_one=True)
                     .final_alpha_cumprod) == 1.0


class TestLowResNoising:
    """DDPMScheduler.add_noise at the reference's noise_level=20
    (stable_diffusion_guidance_sr.py:39,287-290): the exact coefficients the
    published UNet was conditioned on during training."""

    def test_noise_level_20_coefficients(self):
        sch = DiffusionSchedule(1000)
        sqrt_a = float(jnp.sqrt(sch.alphas_cumprod[20]))
        sqrt_1ma = float(jnp.sqrt(1.0 - sch.alphas_cumprod[20]))
        assert sqrt_a == pytest.approx(0.99864973, rel=1e-5)
        assert sqrt_1ma == pytest.approx(0.05194921, rel=1e-4)
        x = jnp.full((2, 4, 4, 3), 0.5)
        n = jnp.full((2, 4, 4, 3), 1.0)
        out = sch.add_noise(x, n, jnp.asarray(20))
        np.testing.assert_allclose(
            np.asarray(out), 0.5 * sqrt_a + sqrt_1ma, rtol=1e-5)


class TestDDIMTimesteps:
    def test_leading_spacing_with_offset(self):
        """diffusers 0.16 set_timesteps: arange(n)*step reversed, + offset."""
        sch = DiffusionSchedule(1000)
        ts = np.asarray(sch.ddim_timesteps(100))
        assert ts[0] == 991 and ts[1] == 981 and ts[-1] == 1
        assert len(ts) == 100 and (np.diff(ts) == -10).all()
        ts75 = np.asarray(sch.ddim_timesteps(75))
        # 1000 // 75 = 13 -> ladder 963, 950, ..., 1 (the reference's
        # num_inference_steps default for the SR recipes)
        assert ts75[0] == 963 and ts75[-1] == 1 and (np.diff(ts75) == -13).all()

    def test_offset_zero_matches_unshifted(self):
        sch = DiffusionSchedule(1000, steps_offset=0)
        ts = np.asarray(sch.ddim_timesteps(100))
        assert ts[0] == 990 and ts[-1] == 0


class TestDDIMStep:
    def test_step_math_against_transcribed_formula(self):
        """One eta=0 DDIM update vs the hand-evaluated diffusers 0.16 step()
        formula at t=501 -> t_prev=491."""
        sch = DiffusionSchedule(1000)
        ac = np.cumprod(1.0 - (np.linspace(1e-4**0.5, 0.02**0.5, 1000) ** 2))
        t, t_prev = 501, 491
        x = jnp.asarray([[0.3, -0.7, 1.1]])
        eps = jnp.asarray([[0.5, 0.25, -0.4]])
        x_prev, pred_x0 = sch.ddim_step(eps, t, t_prev, x)
        x0_ref = (np.asarray(x) - np.sqrt(1 - ac[t]) * np.asarray(eps)) / np.sqrt(ac[t])
        xp_ref = np.sqrt(ac[t_prev]) * x0_ref + np.sqrt(1 - ac[t_prev]) * np.asarray(eps)
        np.testing.assert_allclose(np.asarray(pred_x0), x0_ref, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(x_prev), xp_ref, rtol=1e-4)

    def test_last_step_uses_final_alpha(self):
        """prev_timestep < 0 -> final_alpha_cumprod = alphas_cumprod[0]
        (set_alpha_to_one=false), NOT exactly 1."""
        sch = DiffusionSchedule(1000)
        x = jnp.asarray([[1.0]])
        eps = jnp.asarray([[0.2]])
        x_prev, pred_x0 = sch.ddim_step(eps, 1, -9, x)
        a0 = float(sch.alphas_cumprod[0])
        x0 = (1.0 - np.sqrt(1 - a0) * 0.0)  # a_t = ac[1]
        ac1 = float(sch.alphas_cumprod[1])
        x0_ref = (1.0 - np.sqrt(1 - ac1) * 0.2) / np.sqrt(ac1)
        xp_ref = np.sqrt(a0) * x0_ref + np.sqrt(1 - a0) * 0.2
        np.testing.assert_allclose(float(pred_x0[0, 0]), x0_ref, rtol=1e-5)
        np.testing.assert_allclose(float(x_prev[0, 0]), xp_ref, rtol=1e-5)
