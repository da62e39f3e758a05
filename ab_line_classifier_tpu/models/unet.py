"""U-Net for ultrasound-beam segmentation (auto-masking).

The reference's auto-masking loads a pretrained Keras U-Net ``.h5`` that maps
128x128 grayscale frames to beam-probability masks (reference
``src/data/auto_masking.py:28-77``: input resized to ``(128,128,1)``, scaled
by 1/255, output thresholded at 0.4). The architecture here is a standard
4-level encoder/decoder U-Net with skip connections producing a sigmoid mask,
built on the same layer-graph IR as the classifier zoo so checkpointing,
freezing and weight import work identically.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class UNet(nn.Module):
    """4-level U-Net: 128x128x1 -> 128x128x1 sigmoid beam mask."""

    base_filters: int = 16
    levels: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dtype = self.dtype
        skips = []
        # Encoder
        for level in range(self.levels):
            f = self.base_filters * (2 ** level)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                        name=f"enc{level}_conv1")(x)
            x = nn.relu(x)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                        name=f"enc{level}_conv2")(x)
            x = nn.relu(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # Bottleneck
        f = self.base_filters * (2 ** self.levels)
        x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                    name="bottleneck_conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                    name="bottleneck_conv2")(x)
        x = nn.relu(x)
        # Decoder
        for level in reversed(range(self.levels)):
            f = self.base_filters * (2 ** level)
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2), dtype=dtype,
                                 name=f"dec{level}_up")(x)
            x = jnp.concatenate([x, skips[level]], axis=-1)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                        name=f"dec{level}_conv1")(x)
            x = nn.relu(x)
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=dtype,
                        name=f"dec{level}_conv2")(x)
            x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=dtype, name="head")(x)
        return nn.sigmoid(x.astype(jnp.float32))


def init_unet(rng: jax.Array, input_hw: Tuple[int, int] = (128, 128),
              base_filters: int = 16):
    model = UNet(base_filters=base_filters)
    variables = model.init(rng, jnp.zeros((1,) + tuple(input_hw) + (1,)))
    return model, variables
