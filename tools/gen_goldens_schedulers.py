"""Generate scheduler golden data from the reference implementations.

Run at development time only; outputs tests/goldens/schedulers.npz which is
committed. Tests never import the reference.
"""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()

import numpy as np
import torch

out = {}

# --- FlowMatchScheduler (animation/diffsynth/diffusion/flow_match.py)
from diffsynth.diffusion.flow_match import FlowMatchScheduler

for template in ["Wan", "FLUX.1", "Qwen-Image", "FLUX.2", "Z-Image"]:
    s = FlowMatchScheduler(template)
    kw = {}
    s.set_timesteps(50, **kw)
    out[f"fm_{template}_sigmas"] = s.sigmas.numpy()
    out[f"fm_{template}_timesteps"] = s.timesteps.numpy()

s = FlowMatchScheduler("Wan")
s.set_timesteps(1000, training=True, shift=5.0)
out["fm_wan_train_weights"] = s.linear_timesteps_weights.numpy()
out["fm_wan_train_sigmas"] = s.sigmas.numpy()

s = FlowMatchScheduler("Wan")
s.set_timesteps(50, shift=5.0)
torch.manual_seed(0)
x = torch.randn(2, 4, 8)
v = torch.randn(2, 4, 8)
stepped = s.step(v, s.timesteps[10], x)
out["fm_step_in_x"] = x.numpy()
out["fm_step_in_v"] = v.numpy()
out["fm_step_out"] = stepped.numpy()
noised = s.add_noise(x, v, s.timesteps[17])
out["fm_addnoise_out"] = noised.numpy()

s.set_timesteps(37, training=True, shift=5.0)
out["fm_wan37_weights"] = s.linear_timesteps_weights.numpy()
out["fm_wan37_w_at_5"] = np.array(s.training_weight(s.timesteps[5]).item())

# --- diffusers DDPM + DPMSolver (BrushNet fork)
sys.path.insert(0, "/root/reference/stylization/BrushNet/src")
from diffusers import DDPMScheduler, DPMSolverMultistepScheduler

cfg = dict(
    num_train_timesteps=1000,
    beta_start=0.00085,
    beta_end=0.012,
    beta_schedule="scaled_linear",
    prediction_type="epsilon",
    timestep_spacing="leading",
    steps_offset=1,
)
d = DDPMScheduler(**cfg)
out["ddpm_alphas_cumprod"] = d.alphas_cumprod.numpy()
torch.manual_seed(1)
x0 = torch.randn(2, 4, 8, 8)
eps = torch.randn(2, 4, 8, 8)
tt = torch.tensor([3, 999])
out["ddpm_x0"] = x0.numpy()
out["ddpm_eps"] = eps.numpy()
out["ddpm_t"] = tt.numpy()
out["ddpm_noisy"] = d.add_noise(x0, eps, tt).numpy()
out["ddpm_velocity"] = d.get_velocity(x0, eps, tt).numpy()

dpm = DPMSolverMultistepScheduler(**cfg, algorithm_type="dpmsolver++", solver_order=2)
dpm.set_timesteps(10)
out["dpm_timesteps"] = dpm.timesteps.numpy()
out["dpm_sigmas"] = dpm.sigmas.numpy()
# Full 10-step rollout with a deterministic fake model eps = 0.1 * x
torch.manual_seed(2)
x = torch.randn(1, 4, 8, 8)
out["dpm_x_init"] = x.numpy()
for i, t in enumerate(dpm.timesteps):
    model_out = 0.1 * x
    x = dpm.step(model_out, t, x).prev_sample
out["dpm_x_final"] = x.numpy()

os.makedirs("tests/goldens", exist_ok=True)
np.savez_compressed("tests/goldens/schedulers.npz", **out)
print("wrote", len(out), "arrays")
