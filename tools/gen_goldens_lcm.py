"""Generate LCM scheduler goldens from the vendored diffusers v0.27.

Development-time only; writes tests/goldens/lcm.npz.  The injected
multistep noise is captured by patching randn_tensor so our pure-step
form can replay it exactly.
"""
import os
import sys

sys.path.insert(0, "/root/reference/stylization/BrushNet/src")

import numpy as np
import torch

from diffusers.schedulers import scheduling_lcm

out = {}

for n, origin in ((4, 50), (8, 50), (2, 25)):
    s = scheduling_lcm.LCMScheduler()
    s.set_timesteps(num_inference_steps=n, original_inference_steps=origin)
    out[f"ts_{n}_{origin}"] = s.timesteps.numpy()

# rollout with captured noise
rs = np.random.RandomState(0)
noises = [rs.randn(1, 4, 8, 8).astype(np.float32) for _ in range(4)]
calls = {"i": 0}
orig_randn = scheduling_lcm.randn_tensor


def fake_randn(shape, generator=None, device=None, dtype=None):
    n = torch.from_numpy(noises[calls["i"]])
    calls["i"] += 1
    return n.to(dtype=dtype)


scheduling_lcm.randn_tensor = fake_randn

s = scheduling_lcm.LCMScheduler()
s.set_timesteps(num_inference_steps=4)
sample = torch.from_numpy(rs.randn(1, 4, 8, 8).astype(np.float32))
out["x_init"] = sample.numpy()
eps_list = [rs.randn(1, 4, 8, 8).astype(np.float32) for _ in range(4)]
denoised_list = []
for i, t in enumerate(s.timesteps):
    out[f"eps_{i}"] = eps_list[i]
    res = s.step(torch.from_numpy(eps_list[i]), t, sample, return_dict=True)
    sample = res.prev_sample
    denoised_list.append(res.denoised.numpy())
    out[f"x_{i}"] = sample.numpy()
    out[f"denoised_{i}"] = denoised_list[-1]
for i, nz in enumerate(noises):
    out[f"noise_{i}"] = nz

path = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                    "lcm.npz")
np.savez(path, **out)
print("wrote", path, f"({len(out)} arrays, {calls['i']} noise draws)")
