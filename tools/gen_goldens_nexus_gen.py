"""NexusGen goldens: the reference AR model's generation-mode target-
embedding computation (nexus_gen.py get_target_embeddings) on a tiny
fork instance, plus the generation adapter.
python tools/gen_goldens_nexus_gen.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import transformers.image_utils as iu  # noqa: E402
import transformers.models.qwen2_5_vl.modeling_qwen2_5_vl as mm  # noqa: E402
import transformers.processing_utils as pu  # noqa: E402

for mod, name in [(mm, "QWEN2_5_VL_INPUTS_DOCSTRING"), (iu, "VideoInput"),
                  (pu, "VideosKwargs")]:
    if not hasattr(mod, name):
        setattr(mod, name, "" if name.endswith("DOCSTRING") else object)

import numpy as np  # noqa: E402
import torch  # noqa: E402
from transformers import Qwen2_5_VLConfig  # noqa: E402

from diffsynth.models.nexus_gen_ar_model import (  # noqa: E402
    Qwen2_5_VLForConditionalGeneration,
)
from diffsynth.models.nexus_gen_projector import NexusGenAdapter  # noqa: E402

IMG, VSTART, VEND = 151655, 151652, 151653


def main():
    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        vocab_size=151700, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=1000000.0, rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        vision_config=dict(depth=2, hidden_size=16, num_heads=2,
                           intermediate_size=24, out_hidden_size=32,
                           patch_size=2, temporal_patch_size=2,
                           spatial_merge_size=2, window_size=8,
                           fullatt_block_indexes=[1], in_channels=3),
    )
    m = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    g = torch.Generator().manual_seed(1)
    # generation mode: ONE image slot = the 16 target tokens (blank image)
    grid = torch.tensor([[1, 8, 8]])
    num_img = 16
    prefix = torch.randint(0, 1000, (5,), generator=g)
    suffix = torch.randint(0, 1000, (4,), generator=g)
    ids = torch.cat([prefix, torch.tensor([VSTART]),
                     torch.full((num_img,), IMG), torch.tensor([VEND]),
                     suffix])[None]

    # nexus_gen.py get_target_embeddings, generation branch: ALL image
    # tokens are ground-truth slots -> image_prefill_embeds(arange)
    with torch.no_grad():
        input_embeds = m.model.get_input_embeddings()(ids)
        image_mask = ids == IMG
        prefill = m.image_prefill_embeds(torch.arange(num_img))
        input_embeds = input_embeds.masked_scatter(
            image_mask.unsqueeze(-1).expand_as(input_embeds), prefill)
        position_ids, _ = m.get_rope_index(
            ids, grid, attention_mask=torch.ones_like(ids))
        out = m(inputs_embeds=input_embeds,
                position_ids=position_ids.contiguous(),
                attention_mask=torch.ones_like(ids), return_dict=True)
        emb = out.image_embeddings[:, :-1, :]
        target = emb[image_mask[:, 1:]]

        adapter = NexusGenAdapter(input_dim=32, output_dim=24).eval()
        for p in adapter.parameters():
            p.add_(torch.randn_like(p) * 0.05)
        adapted = adapter(target)

    sd = {k: v.numpy() for k, v in m.state_dict().items()
          if not k.startswith("model.visual.")}
    asd = {f"adapter.{k}": v.numpy() for k, v in adapter.state_dict().items()}
    np.savez("../tests/goldens/nexus_gen.npz",
             ids=ids.numpy(), grid=grid.numpy(), target=target.numpy(),
             adapted=adapted.numpy(),
             **{f"sd.{k}": v for k, v in sd.items()}, **asd)
    print("wrote tests/goldens/nexus_gen.npz", target.shape, adapted.shape)


if __name__ == "__main__":
    main()
