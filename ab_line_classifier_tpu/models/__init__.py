from ab_line_classifier_tpu.models.common import ModelSpec, TrainPhase  # noqa: F401
from ab_line_classifier_tpu.models.registry import (  # noqa: F401
    MODEL_NAMES,
    build_model,
    get_model,
    get_preprocess_mode,
)
from ab_line_classifier_tpu.models.preprocess import (  # noqa: F401
    get_preprocess_fn,
    preprocess_affine_params,
)
