"""Qwen-Image extras goldens via the REAL model_fn_qwen_image: layered
generation, zero_cond_t per-token modulation, EliGen entity masks, and
edit rope interpolation.  python tools/gen_goldens_qwen_extras.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.pipelines.qwen_image import model_fn_qwen_image  # noqa: E402

from gen_goldens_qwen_dit import TXT_DIM, build_tiny  # noqa: E402


def main():
    dit = build_tiny()
    g = torch.Generator().manual_seed(89)
    prompt_emb = torch.randn(1, 6, TXT_DIM, generator=g)
    mask = torch.ones(1, 6, dtype=torch.long)
    ts = torch.tensor([614.0])

    out = {}
    with torch.no_grad():
        # layered: 3 layers (layer_num=2 -> model uses layer_num+1)
        lat3 = torch.randn(3, 4, 8, 12, generator=g)
        out["layer_lat"] = lat3.numpy()
        out["layer_out"] = model_fn_qwen_image(
            dit=dit, latents=lat3, timestep=ts, prompt_emb=prompt_emb,
            prompt_emb_mask=mask, height=64, width=96, layer_num=2).numpy()

        # zero_cond_t with an edit stream
        lat = torch.randn(1, 4, 8, 12, generator=g)
        edit = torch.randn(1, 4, 6, 8, generator=g)
        out["zc_lat"], out["zc_edit"] = lat.numpy(), edit.numpy()
        out["zc_out"] = model_fn_qwen_image(
            dit=dit, latents=lat, timestep=ts, prompt_emb=prompt_emb,
            prompt_emb_mask=mask, height=64, width=96, edit_latents=[edit],
            zero_cond_t=True).numpy()

        # edit rope interpolation (edit at a different resolution)
        out["eri_out"] = model_fn_qwen_image(
            dit=dit, latents=lat, timestep=ts, prompt_emb=prompt_emb,
            prompt_emb_mask=mask, height=64, width=96, edit_latents=[edit],
            edit_rope_interpolation=True).numpy()

        # EliGen: 2 entities with their own prompt lengths
        e1 = torch.randn(1, 4, TXT_DIM, generator=g)
        e2 = torch.randn(1, 5, TXT_DIM, generator=g)
        m1 = torch.ones(1, 4, dtype=torch.long)
        m2 = torch.ones(1, 5, dtype=torch.long)
        masks = torch.zeros(1, 2, 1, 8, 12)
        masks[:, 0, :, :, :6] = 1.0
        masks[:, 1, :, :, 6:] = 1.0
        out["ent_e1"], out["ent_e2"] = e1.numpy(), e2.numpy()
        out["ent_masks"] = masks.numpy()
        out["ent_out"] = model_fn_qwen_image(
            dit=dit, latents=lat, timestep=ts, prompt_emb=prompt_emb,
            prompt_emb_mask=mask, height=64, width=96,
            entity_prompt_emb=[e1, e2], entity_prompt_emb_mask=[m1, m2],
            entity_masks=masks).numpy()

    out["prompt_emb"] = prompt_emb.numpy()
    out["timestep"] = ts.numpy()
    out.update({f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()
                if "pos_embed" not in k})
    np.savez("../tests/goldens/qwen_extras.npz", **out)
    print("wrote tests/goldens/qwen_extras.npz",
          out["layer_out"].shape, out["ent_out"].shape)


if __name__ == "__main__":
    main()
