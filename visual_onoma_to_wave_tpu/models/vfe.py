"""Visual feature extractor: per-character image cells -> pseudo-token embeddings.

The reference slices the batch image tensor with a Python double loop
(reference scripts/model/visual_feature_extractor.py:60-74) — a host-sync hot
spot. Because every character cell has the same static width (`slice_width`,
102 px after dataset-side re-padding, reference dataset.py:71-92), the slicing
is just a reshape: (B, H, C*Wc, 1) -> (B, C, H, Wc, 1). We therefore take the
cells pre-reshaped as (B, C, H, Wc) and run the whole conv stack batched over
B*C cells — one XLA conv, no loops.

Conv stack semantics preserved: `layer_num` x [Conv2d(1->1, 3x3, SAME) ->
BatchNorm -> ReLU], then flatten + Dense(H*Wc -> embed_dim) + ReLU bridge,
all parameters initialized U(-0.08, 0.08) (reference vfe.py:40-58).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def uniform_init(scale: float = 0.08):
    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def slice_image_to_cells(images: jnp.ndarray, cell_width: int, stride: int = 1) -> jnp.ndarray:
    """(B, H, W) flat strip -> (B, n_cells, H, cell_width * stride) cells.

    Equivalent to the reference slicing loop (vfe.py:63-74):
    n_cells = (W - (stride//2)*cell_width*2) / cell_width, each cell i covering
    columns [i*cell_width, i*cell_width + cell_width*stride).
    For the shipped stride=1 this is a pure reshape.
    """
    B, H, W = images.shape
    margin = (stride // 2) * cell_width
    n_cells = (W - 2 * margin) // cell_width
    if stride == 1:
        return images[:, :, : n_cells * cell_width].reshape(B, H, n_cells, cell_width).transpose(0, 2, 1, 3)
    # overlapping windows for stride > 1 (gather once; still static-shaped)
    starts = jnp.arange(n_cells) * cell_width
    idx = starts[:, None] + jnp.arange(cell_width * stride)[None, :]
    cells = images[:, :, idx]          # (B, H, n_cells, cw*stride)
    return cells.transpose(0, 2, 1, 3)


class VisualFeatureExtractor(nn.Module):
    """CNN embedder for visual-onomatopoeia character cells.

    Input:  (B, n_chars, H, Wc) float32 in [0, 1] (grayscale cells)
    Output: (B, n_chars, embed_dim)
    """

    embed_dim: int = 256
    kernel_size: tuple[int, int] = (3, 3)
    num_convolutions: int = 3
    channels: int = 1          # grayscale; 3 for RGB-scale
    embed_normalize: bool = True
    bridge_relu: bool = True

    @nn.compact
    def __call__(self, cells: jnp.ndarray, deterministic: bool):
        B, C, H, W = cells.shape
        assert self.kernel_size[0] % 2 == 1 and self.kernel_size[1] % 2 == 1, (
            "conv2d kernel sizes must be odd"
        )
        # (B*C, H, W, channels): NHWC for XLA conv
        x = cells.reshape(B * C, H, W, 1)
        if self.channels == 3:
            # RGB-scale: grayscale glyphs replicated per channel, matching
            # the reference loader's PIL convert("RGB")
            x = jnp.repeat(x, 3, axis=-1)
        for i in range(self.num_convolutions):
            x = nn.Conv(
                self.channels, self.kernel_size, padding="SAME",
                kernel_init=uniform_init(), bias_init=uniform_init(),
                name=f"conv_{i}",
            )(x)
            if self.embed_normalize:
                x = nn.BatchNorm(
                    use_running_average=deterministic, momentum=0.9,
                    scale_init=uniform_init(), bias_init=uniform_init(),
                    name=f"bn_{i}",
                )(x)
            x = nn.relu(x)
        x = x.reshape(B * C, H * W * self.channels)
        x = nn.Dense(
            self.embed_dim,
            kernel_init=uniform_init(), bias_init=uniform_init(),
            name="bridge",
        )(x)
        if self.bridge_relu:
            x = nn.relu(x)
        return x.reshape(B, C, self.embed_dim)
