from .dit import WanDiTConfig, init_dit_params, convert_dit_state_dict, wan_dit_forward
