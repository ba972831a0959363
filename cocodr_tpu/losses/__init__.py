from cocodr_tpu.losses.nll import triplet_nll, triplet_nll_multichunk  # noqa: F401
from cocodr_tpu.losses.contrastive import (  # noqa: F401
    co_contrastive_loss,
    flipped_pair_targets,
)
from cocodr_tpu.losses.dro import (  # noqa: F401
    DroConfig,
    DroState,
    dro_greedy_init,
    dro_greedy_loss,
    idro_init,
    idro_loss,
    per_group_grads,
)
