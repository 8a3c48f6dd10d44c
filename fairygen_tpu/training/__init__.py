from .losses import flow_match_sft_loss
from .train_step import make_wan_sft_train_step, TrainState
from .optimizers import make_optimizer
