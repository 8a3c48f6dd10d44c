"""FLUX text-encoder goldens.

T5 v1.1: tiny transformers T5EncoderModel (FLUX's TE2 subclasses it
directly, flux_text_encoder_t5.py:5).  CLIP: tiny hand-assembled
FluxTextEncoderClip (its __init__ hard-codes 12 heads x 64 head_dim inner
projections).  python tools/gen_goldens_flux_text.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402


def t5_goldens():
    from transformers import T5Config, T5EncoderModel

    torch.manual_seed(0)
    cfg = T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, dense_act_fn="gelu_new",
        is_gated_act=True, tie_word_embeddings=False, dropout_rate=0.0,
        layer_norm_epsilon=1e-6, feed_forward_proj="gated-gelu",
    )
    model = T5EncoderModel(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    ids = torch.randint(0, 96, (2, 10), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        out = model(input_ids=ids).last_hidden_state
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return ids.numpy(), out.numpy(), sd


def clip_goldens():
    from diffsynth.models.flux_text_encoder_clip import (
        CLIPEncoderLayer,
        FluxTextEncoderClip,
    )

    torch.manual_seed(2)
    D, L, V, I = 32, 2, 100, 64
    te = FluxTextEncoderClip.__new__(FluxTextEncoderClip)
    torch.nn.Module.__init__(te)
    te.token_embedding = torch.nn.Embedding(V, D)
    te.position_embeds = torch.nn.Parameter(torch.randn(1, 16, D) * 0.02)
    te.encoders = torch.nn.ModuleList(
        [CLIPEncoderLayer(D, I, num_heads=4, head_dim=8) for _ in range(L)])
    te.attn_mask = te.attention_mask(16)
    te.final_layer_norm = torch.nn.LayerNorm(D)
    with torch.no_grad():
        for p in te.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    te.eval()
    g = torch.Generator().manual_seed(3)
    ids = torch.randint(0, V - 1, (2, 16), generator=g)
    ids[0, 9:] = V - 1  # eos/pad tail (argmax pools here)
    ids[1, 13:] = V - 1
    with torch.no_grad():
        pooled, hidden = te(ids, clip_skip=2)
    sd = {k: v.numpy() for k, v in te.state_dict().items()}
    return ids.numpy(), pooled.numpy(), hidden.numpy(), sd


def main():
    t5_ids, t5_out, t5_sd = t5_goldens()
    c_ids, c_pooled, c_hidden, c_sd = clip_goldens()
    np.savez(
        "../tests/goldens/flux_text.npz",
        t5_ids=t5_ids, t5_out=t5_out, clip_ids=c_ids, clip_pooled=c_pooled,
        clip_hidden=c_hidden,
        **{f"t5.{k}": v for k, v in t5_sd.items()},
        **{f"clip.{k}": v for k, v in c_sd.items()},
    )
    print("wrote tests/goldens/flux_text.npz", t5_out.shape, c_pooled.shape)


if __name__ == "__main__":
    main()
