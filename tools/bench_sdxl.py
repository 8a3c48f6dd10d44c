# SDXL + BrushNet 1024px step timing with zero weights (structure-true)
import time, functools, jax, jax.numpy as jnp, numpy as np
from fairygen_tpu.models.sdxl.unet2d import (
    UNet2DConfig, unet2d_forward, brushnet_forward, init_unet2d_params)

dtype = jnp.bfloat16
ucfg = UNet2DConfig.sdxl_base()
bcfg = UNet2DConfig.brushnet_sdxl()
up = init_unet2d_params(ucfg, dtype)
bp = init_unet2d_params(bcfg, dtype, brushnet=True)

B = 2  # CFG
x = jnp.zeros((B, 4, 128, 128), dtype)
t = jnp.asarray(500.0)
ehs = jnp.zeros((B, 77, 2048), dtype)
te = jnp.zeros((B, 1280), dtype)
ti = jnp.zeros((B, 6), jnp.float32)
cond = jnp.zeros((B, 5, 128, 128), dtype)

@jax.jit
def step(up_p, bp_p, x):
    d, m, u = brushnet_forward(bp_p, bcfg, x, t, ehs, cond, text_embeds=te, time_ids=ti,
                               conditioning_scale=0.7)
    return unet2d_forward(up_p, ucfg, x, t, ehs, text_embeds=te, time_ids=ti,
                          down_block_add_samples=list(d), mid_block_add_sample=m,
                          up_block_add_samples=list(u))

o = step(up, bp, x); print("compiled", flush=True)
float(o.astype(jnp.float32).sum())
N = 5
t0 = time.perf_counter()
for _ in range(N):
    o = step(up, bp, x)
float(o.astype(jnp.float32).sum())
dt = (time.perf_counter()-t0)/N
print(f"SDXL+BrushNet 1024px CFG step: {dt*1e3:.0f} ms -> 50-step image: {dt*50:.1f}s "
      f"({1/(dt*50):.2f} img/s/chip)", flush=True)

# --- LCM few-step mode: no CFG (guidance embedded in the distilled model),
# 4 steps + fp32 VAE decode = the published >1 img/s path.
x1 = jnp.zeros((1, 4, 128, 128), dtype)
ehs1, te1_, ti1 = ehs[:1], te[:1], ti[:1]
cond1 = cond[:1]

@jax.jit
def lcm_step(up_p, bp_p, x):
    d, m, u = brushnet_forward(bp_p, bcfg, x, t, ehs1, cond1, text_embeds=te1_,
                               time_ids=ti1, conditioning_scale=0.7)
    return unet2d_forward(up_p, ucfg, x, t, ehs1, text_embeds=te1_, time_ids=ti1,
                          down_block_add_samples=list(d), mid_block_add_sample=m,
                          up_block_add_samples=list(u))

o = lcm_step(up, bp, x1); float(o.astype(jnp.float32).sum())
t0 = time.perf_counter()
for _ in range(N):
    o = lcm_step(up, bp, x1)
float(o.astype(jnp.float32).sum())
dt1 = (time.perf_counter()-t0)/N

from fairygen_tpu.models.sdxl.vae import AutoencoderKLConfig, vae_decode
vcfg = AutoencoderKLConfig.sdxl()
try:
    from fairygen_tpu.models.sdxl.vae import init_autoencoder_kl_params
    vp = init_autoencoder_kl_params(vcfg, jnp.float32, include_encoder=False)
    dec = jax.jit(lambda p, z: vae_decode(p, vcfg, z))
    z = jnp.zeros((1, 4, 128, 128), jnp.float32)
    img = dec(vp, z); float(img.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    img = dec(vp, z); float(img.astype(jnp.float32).sum())
    dt_vae = time.perf_counter() - t0
except Exception as e:
    print("vae decode bench skipped:", e)
    dt_vae = 0.0

for steps in (4, 8):
    total = dt1 * steps + dt_vae
    print(f"LCM {steps}-step 1024px image (no-CFG step {dt1*1e3:.0f} ms "
          f"+ VAE {dt_vae*1e3:.0f} ms): {total:.2f}s ({1/total:.2f} img/s/chip)",
          flush=True)
