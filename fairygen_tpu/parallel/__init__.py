from .ring import make_ring_attention
from .ulysses import make_ulysses_attention, pad_to_multiple
