from nerfail_tpu.attacks.forward import (
    splat_attack_forward,
    universal_2d_forward,
    make_classifier_logits_fn,
    zero_init_mask,
)
from nerfail_tpu.attacks.deepfool import deepfool

__all__ = [
    "splat_attack_forward",
    "universal_2d_forward",
    "make_classifier_logits_fn",
    "zero_init_mask",
    "deepfool",
]
