from .attention import attention, set_attention_implementation
from .rope import precompute_freqs_3d, rope_apply
from .norms import rms_norm, layer_norm, t5_layer_norm, modulate
