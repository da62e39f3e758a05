"""Per-model input scaling functions.

The reference pairs each architecture with a Keras ``preprocess_input``
(reference ``src/models/models.py:12-16,20-48``); the tf.data pipeline applies
it after resize (reference ``src/data/preprocessor.py:59-63``). These are the
same deterministic formulas, written for JAX. All take a float tensor of RGB
values in [0, 255] (NHWC) and return the model-ready tensor.

Modes (matching keras.applications semantics):

* ``caffe``  — VGG16: RGB->BGR channel swap, subtract ImageNet BGR means.
* ``tf``     — MobileNetV2 / Xception / ResNetV2: scale to [-1, 1].
* ``scale``  — plain ``x / 255`` (the pipeline's default when a model has no
  preprocess function, reference preprocessor.py:61).
* ``identity`` — EfficientNet: the Keras preprocess_input is a passthrough
  because normalization lives inside the model graph.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

# ImageNet channel means in BGR order (keras 'caffe' mode).
CAFFE_MEAN_BGR = np.array([103.939, 116.779, 123.68], dtype=np.float32)

# ImageNet mean/std in RGB order for 'torch' mode (EfficientNet's in-model
# Normalization layer uses these over x/255 input).
TORCH_MEAN_RGB = np.array([0.485, 0.456, 0.406], dtype=np.float32)
TORCH_STD_RGB = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def preprocess_caffe(x):
    """VGG16 preprocessing: RGB->BGR and zero-center by ImageNet BGR means."""
    x = x[..., ::-1]  # RGB -> BGR
    return x - jnp.asarray(CAFFE_MEAN_BGR, dtype=x.dtype)


def preprocess_tf(x):
    """MobileNetV2 / Xception / ResNetV2 preprocessing: scale to [-1, 1]."""
    return x / 127.5 - 1.0


def preprocess_scale(x):
    """Default pipeline scaling ``x / 255`` (reference preprocessor.py:61)."""
    return x / 255.0


def preprocess_identity(x):
    """EfficientNet: passthrough (normalization is inside the model)."""
    return x


PREPROCESS_FNS: Dict[str, Callable] = {
    "caffe": preprocess_caffe,
    "tf": preprocess_tf,
    "scale": preprocess_scale,
    "identity": preprocess_identity,
}


def get_preprocess_fn(mode: str) -> Callable:
    try:
        return PREPROCESS_FNS[mode]
    except KeyError as e:
        raise ValueError(f"unknown preprocess mode {mode!r}") from e


# Affine (scale, bias) form of each mode, used by the fused Pallas
# resize+normalize kernel: out[c] = x[c_src] * scale[c] + bias[c], where the
# channel source permutation handles the caffe BGR swap.
def preprocess_affine_params(mode: str):
    """Return (channel_perm[3], scale[3], bias[3]) so that
    ``out[..., c] = x[..., perm[c]] * scale[c] + bias[c]`` equals the mode's
    preprocessing. All modes in the zoo are channelwise-affine."""
    if mode == "caffe":
        return (np.array([2, 1, 0]), np.ones(3, np.float32),
                -CAFFE_MEAN_BGR)
    if mode == "tf":
        return (np.arange(3), np.full(3, 1.0 / 127.5, np.float32),
                np.full(3, -1.0, np.float32))
    if mode == "scale":
        return (np.arange(3), np.full(3, 1.0 / 255.0, np.float32),
                np.zeros(3, np.float32))
    if mode == "identity":
        return (np.arange(3), np.ones(3, np.float32), np.zeros(3, np.float32))
    raise ValueError(f"unknown preprocess mode {mode!r}")
