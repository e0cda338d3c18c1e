from nerfail_tpu.eval.metrics import (
    perturbation_stats,
    attack_success_rate,
    psnr_255,
)
from nerfail_tpu.eval.harness import evaluate_attack

__all__ = [
    "perturbation_stats",
    "attack_success_rate",
    "psnr_255",
    "evaluate_attack",
]
