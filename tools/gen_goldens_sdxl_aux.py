"""Goldens for SDXL VAE (AutoencoderKL) and CLIP text encoders (tiny)."""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()
sys.path.insert(0, "/root/reference/stylization/BrushNet/src")

import numpy as np
import torch

out = {}

# --- AutoencoderKL (vendored diffusers)
from diffusers import AutoencoderKL

torch.manual_seed(31)
vae = AutoencoderKL(
    in_channels=3, out_channels=3, latent_channels=4,
    down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
    up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
    block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8,
).eval()
for k, v in vae.state_dict().items():
    out[f"vae::{k}"] = v.float().numpy()
img = torch.randn(1, 3, 32, 32).clamp(-1, 1)
with torch.no_grad():
    lat = vae.encode(img).latent_dist.mode()
    dec = vae.decode(lat).sample
out["vae_img"] = img.numpy()
out["vae_lat"] = lat.numpy()
out["vae_dec"] = dec.numpy()

# --- CLIP text encoders (transformers)
from transformers import CLIPTextConfig as HFCfg, CLIPTextModel, CLIPTextModelWithProjection

torch.manual_seed(32)
cfg1 = HFCfg(vocab_size=100, hidden_size=32, intermediate_size=64,
             num_hidden_layers=2, num_attention_heads=4,
             max_position_embeddings=16, hidden_act="quick_gelu", eos_token_id=99)
te1 = CLIPTextModel(cfg1).eval()
cfg2 = HFCfg(vocab_size=100, hidden_size=48, intermediate_size=96,
             num_hidden_layers=2, num_attention_heads=4,
             max_position_embeddings=16, hidden_act="gelu", projection_dim=40, eos_token_id=99)
te2 = CLIPTextModelWithProjection(cfg2).eval()
for k, v in te1.state_dict().items():
    out[f"te1::{k}"] = v.float().numpy()
for k, v in te2.state_dict().items():
    out[f"te2::{k}"] = v.float().numpy()

ids = torch.randint(1, 99, (2, 16))
ids[0, 9] = 99  # pretend eos (max id)
ids[1, 14] = 99
with torch.no_grad():
    o1 = te1(ids, output_hidden_states=True)
    o2 = te2(ids, output_hidden_states=True)
out["ids"] = ids.numpy()
out["te1_penult"] = o1.hidden_states[-2].numpy()
out["te1_last"] = o1.last_hidden_state.numpy()
out["te2_penult"] = o2.hidden_states[-2].numpy()
out["te2_text_embeds"] = o2.text_embeds.numpy()

np.savez_compressed("tests/goldens/sdxl_aux.npz", **out)
print("wrote", len(out), "arrays")
