from .ulysses import make_ulysses_attention, pad_to_multiple
