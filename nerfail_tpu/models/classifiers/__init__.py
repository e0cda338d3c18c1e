from nerfail_tpu.models.classifiers.registry import (
    get_classifier,
    classifier_input_size,
    CLASSIFIER_REGISTRY,
)

__all__ = ["get_classifier", "classifier_input_size", "CLASSIFIER_REGISTRY"]
