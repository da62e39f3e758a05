"""Model registry — the ``get_model(name)`` public API (reference
``src/models/models.py:20-48`` returns ``(model_def, preprocessing_function)``;
here the builder returns a :class:`ModelSpec` that carries its preprocessing
mode, so the pair is derived from one source of truth).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from ab_line_classifier_tpu.models.common import ModelSpec
from ab_line_classifier_tpu.models.preprocess import get_preprocess_fn
from ab_line_classifier_tpu.models.vgg import build_vgg16, build_cutoffvgg16
from ab_line_classifier_tpu.models.mobilenet_v2 import build_mobilenetv2
from ab_line_classifier_tpu.models.xception import build_xception
from ab_line_classifier_tpu.models.efficientnet import build_efficientnetb7
from ab_line_classifier_tpu.models.cnn0 import build_cnn0
from ab_line_classifier_tpu.models.resnet_v2 import build_custom_resnetv2

# name -> (builder, preprocess mode). Builder signature:
# (hparams, input_shape, n_classes, mixed_precision, output_bias, **kw) -> ModelSpec
_REGISTRY: Dict[str, Tuple[Callable[..., ModelSpec], str]] = {
    "vgg16": (build_vgg16, "caffe"),
    "cutoffvgg16": (build_cutoffvgg16, "caffe"),
    "mobilenetv2": (build_mobilenetv2, "tf"),
    "xception": (build_xception, "tf"),
    "efficientnetb7": (build_efficientnetb7, "identity"),
    "custom_resnetv2": (build_custom_resnetv2, "tf"),
    "cnn0": (build_cnn0, "tf"),
}

MODEL_NAMES = tuple(_REGISTRY)


def get_model(model_name: str) -> Tuple[Callable[..., ModelSpec], Callable]:
    """Return ``(builder, preprocess_fn)`` for a model name. Unknown names
    fall back to ``cnn0`` exactly like the reference registry's else-branch
    (models.py:45-47)."""
    builder, mode = _REGISTRY.get(model_name.lower(), _REGISTRY["cnn0"])
    return builder, get_preprocess_fn(mode)


def get_preprocess_mode(model_name: str) -> str:
    return _REGISTRY.get(model_name.lower(), _REGISTRY["cnn0"])[1]


def build_model(model_name: str, hparams: Dict[str, Any],
                input_shape: Tuple[int, int, int], n_classes: int,
                mixed_precision: bool = False,
                output_bias: Optional[np.ndarray] = None,
                **kwargs: Any) -> ModelSpec:
    """Build a ModelSpec the way the reference calls ``model_def(...)``
    (train.py:117-121)."""
    builder, _ = get_model(model_name)
    return builder(hparams, tuple(input_shape), n_classes,
                   mixed_precision=mixed_precision, output_bias=output_bias,
                   **kwargs)
