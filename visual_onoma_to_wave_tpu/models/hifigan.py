"""HiFi-GAN V1 "universal" generator (inference) in JAX/flax.

Re-design of reference scripts/hifigan/models.py (Generator + ResBlock,
config at scripts/hifigan/config.json): 256x upsampling via 4 transposed
convs (rates 8,8,2,2 / kernels 16,16,4,4) each followed by a 3-branch
multi-receptive-field (MRF) fusion of dilated residual blocks
(kernels 3/7/11, dilations (1,3,5)).

Exact-parity notes:
  * ConvTranspose1d(stride=u, padding=(k-u)//2) in torch gives output length
    exactly T*u. We implement it as an lhs-dilated conv with padding
    k-1-(k-u)//2 and a flipped kernel — bit-exact semantics, and XLA lowers
    it onto the MXU as a strided matmul.
  * leaky_relu slope is 0.1 inside the network but torch's default 0.01
    before conv_post (reference models.py:161 `F.leaky_relu(x)`).
  * weight-norm is folded at weight-conversion time (the reference calls
    remove_weight_norm at load; utils/model.py:67).

`load_torch_generator` converts the published PyTorch checkpoint
(generator_universal.pth.tar) into this module's parameter pytree.
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None,
            dilation: int = 1, stride: int = 1,
            dtype=jnp.float32) -> jnp.ndarray:
    """1-D conv, feature-last. x: (B, T, Cin); w: (K, Cin, Cout); SAME-style
    torch padding dilation*(k-1)//2. `dtype` is the compute precision of the
    conv inputs (bf16 doubles MXU throughput); accumulation is always f32."""
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    # no preferred_element_type: TPU convs accumulate f32 regardless and
    # round once to the output dtype (identical numerics to an f32 output +
    # astype), while mixed preferred/operand dtypes break the conv's
    # transpose rule under grad (bf16 GAN training)
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), window_strides=(stride,),
        padding=[(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ).astype(dtype)
    return out + b.astype(dtype) if b is not None else out


def _conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None,
                      stride: int, torch_padding: int,
                      dtype=jnp.float32) -> jnp.ndarray:
    """torch ConvTranspose1d semantics. x: (B, T, Cin); w: (K, Cin, Cout)
    ALREADY flipped relative to torch layout (see load_torch_generator).
    Output length = (T-1)*stride - 2*torch_padding + K."""
    k = w.shape[0]
    pad = k - 1 - torch_padding
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), window_strides=(1,),
        padding=[(pad, pad)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ).astype(dtype)
    return out + b.astype(dtype) if b is not None else out


class ResBlock1(nn.Module):
    """MRF residual block: 3x [lrelu -> dilated conv -> lrelu -> conv d=1 -> +x]."""

    channels: int
    kernel_size: int
    dilations: tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            w1 = self.param(f"convs1_{i}_w", nn.initializers.normal(0.01),
                            (self.kernel_size, self.channels, self.channels))
            b1 = self.param(f"convs1_{i}_b", nn.initializers.zeros, (self.channels,))
            w2 = self.param(f"convs2_{i}_w", nn.initializers.normal(0.01),
                            (self.kernel_size, self.channels, self.channels))
            b2 = self.param(f"convs2_{i}_b", nn.initializers.zeros, (self.channels,))
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = _conv1d(h, w1, b1, dilation=d, dtype=self.dtype)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = _conv1d(h, w2, b2, dilation=1, dtype=self.dtype)
            x = x + h
        return x


class ResBlock2(nn.Module):
    """Official resblock type "2" (config_v3.json): 2x [lrelu -> dilated
    conv -> +x] — one conv per residual, each with its own dilation
    (reference hifi-gan models.py ResBlock2)."""

    channels: int
    kernel_size: int
    dilations: tuple[int, ...] = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            w = self.param(f"convs_{i}_w", nn.initializers.normal(0.01),
                           (self.kernel_size, self.channels, self.channels))
            b = self.param(f"convs_{i}_b", nn.initializers.zeros,
                           (self.channels,))
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = _conv1d(h, w, b, dilation=d, dtype=self.dtype)
            x = x + h
        return x


# Official model-size presets (hifi-gan config_v{2,3}.json). V1 is the
# module's defaults; V2 trades channels for 4x fewer parameters at the
# same receptive field; V3 swaps in the cheaper ResBlock2 and a 3-stage
# (8,8,4) upsample — all keep total_upsample == 256 == hop_length.
HIFIGAN_PRESETS = {
    "v1": {},
    "v2": {"upsample_initial_channel": 128},
    "v3": {
        "resblock_type": "2",
        "upsample_rates": (8, 8, 4),
        "upsample_kernel_sizes": (16, 16, 8),
        "upsample_initial_channel": 256,
        "resblock_kernel_sizes": (3, 5, 7),
        "resblock_dilations": ((1, 2), (2, 6), (3, 12)),
    },
}


class HiFiGANGenerator(nn.Module):
    """Mel (B, T, 80) -> waveform (B, T*256)."""

    upsample_rates: tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_type: str = "1"  # "1" (V1/V2 configs) or "2" (V3)
    n_mels: int = 80
    dtype: jnp.dtype = jnp.float32  # compute precision; params stay f32

    @property
    def total_upsample(self) -> int:
        """Samples emitted per input mel frame (== hop_length at parity)."""
        return int(np.prod(self.upsample_rates, dtype=np.int64))

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        ch0 = self.upsample_initial_channel
        w = self.param("conv_pre_w", nn.initializers.normal(0.01), (7, self.n_mels, ch0))
        b = self.param("conv_pre_b", nn.initializers.zeros, (ch0,))
        x = _conv1d(mel, w, b, dtype=self.dtype)

        n_kernels = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            cin = ch0 // (2 ** i)
            cout = ch0 // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            wt = self.param(f"up_{i}_w", nn.initializers.normal(0.01), (k, cin, cout))
            bt = self.param(f"up_{i}_b", nn.initializers.zeros, (cout,))
            x = _conv_transpose1d(x, wt, bt, stride=u,
                                  torch_padding=(k - u) // 2, dtype=self.dtype)
            acc = None
            block_cls = ResBlock2 if self.resblock_type == "2" else ResBlock1
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                y = block_cls(cout, rk, tuple(rd), dtype=self.dtype,
                              name=f"resblock_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / n_kernels

        x = nn.leaky_relu(x, 0.01)  # torch F.leaky_relu default slope
        ch_last = ch0 // (2 ** len(self.upsample_rates))
        w = self.param("conv_post_w", nn.initializers.normal(0.01), (7, ch_last, 1))
        b = self.param("conv_post_b", nn.initializers.zeros, (1,))
        x = _conv1d(x.astype(jnp.float32), w, b)  # final conv in f32
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------

def _fold_weight_norm(state: dict, prefix: str) -> np.ndarray:
    """Fold weight_g/weight_v into a plain weight (what remove_weight_norm does)."""
    if f"{prefix}.weight" in state:
        return np.asarray(state[f"{prefix}.weight"], dtype=np.float32)
    g = np.asarray(state[f"{prefix}.weight_g"], dtype=np.float32)
    v = np.asarray(state[f"{prefix}.weight_v"], dtype=np.float32)
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm


def _t_conv(state: dict, prefix: str):
    """torch Conv1d weight (Cout, Cin, K) -> HIO (K, Cin, Cout)."""
    w = _fold_weight_norm(state, prefix).transpose(2, 1, 0)
    b = np.asarray(state[f"{prefix}.bias"], dtype=np.float32)
    return w, b


def _t_convtr(state: dict, prefix: str):
    """torch ConvTranspose1d weight (Cin, Cout, K) -> flipped HIO (K, Cin, Cout)."""
    w = _fold_weight_norm(state, prefix)          # (Cin, Cout, K)
    w = w[:, :, ::-1].transpose(2, 0, 1).copy()   # flip K, -> (K, Cin, Cout)
    b = np.asarray(state[f"{prefix}.bias"], dtype=np.float32)
    return w, b


def convert_torch_state_dict(
    state: dict,
    upsample_rates=(8, 8, 2, 2),
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    resblock_type: str = "1",
) -> dict:
    """Map a torch HiFi-GAN generator state_dict (reference layout:
    conv_pre / ups.N / resblocks.M.convs{1,2}.J / conv_post; V3 checkpoints
    use resblocks.M.convs.J) to this module's parameter pytree."""
    params: dict = {}
    w, b = _t_conv(state, "conv_pre")
    params["conv_pre_w"], params["conv_pre_b"] = w, b
    n_kernels = len(resblock_kernel_sizes)
    for i in range(len(upsample_rates)):
        w, b = _t_convtr(state, f"ups.{i}")
        params[f"up_{i}_w"], params[f"up_{i}_b"] = w, b
        for j in range(n_kernels):
            r = i * n_kernels + j
            block: dict = {}
            for di in range(len(resblock_dilations[j])):
                if resblock_type == "2":
                    w1, b1 = _t_conv(state, f"resblocks.{r}.convs.{di}")
                    block[f"convs_{di}_w"], block[f"convs_{di}_b"] = w1, b1
                else:
                    w1, b1 = _t_conv(state, f"resblocks.{r}.convs1.{di}")
                    w2, b2 = _t_conv(state, f"resblocks.{r}.convs2.{di}")
                    block[f"convs1_{di}_w"], block[f"convs1_{di}_b"] = w1, b1
                    block[f"convs2_{di}_w"], block[f"convs2_{di}_b"] = w2, b2
            params[f"resblock_{i}_{j}"] = block
    w, b = _t_conv(state, "conv_post")
    params["conv_post_w"], params["conv_post_b"] = w, b
    return jax.tree.map(jnp.asarray, params)


def load_torch_generator(ckpt_path: str) -> dict:
    """Load the published generator_universal.pth.tar into a params pytree."""
    import torch

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = obj["generator"] if "generator" in obj else obj
    state = {k: v.numpy() for k, v in state.items()}
    return {"params": convert_torch_state_dict(state)}


@functools.partial(jax.jit, static_argnames=("gen",))
def _infer(gen, params, mel):
    return gen.apply(params, mel)


def receptive_halo_frames(
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    pre_kernel: int = 7,
    post_kernel: int = 7,
    resblock_type: str = "1",
) -> int:
    """One-sided receptive field of the generator in INPUT mel frames.

    A mel frame's output samples depend on at most this many neighbouring
    frames on each side, so chunked vocoding with this halo is sample-exact
    away from the true sequence edges.
    """
    halo = (post_kernel - 1) // 2  # samples at output rate
    for u, k, in zip(reversed(upsample_rates),
                     reversed(upsample_kernel_sizes)):
        # MRF half-span at this stage's rate, max over branches:
        # ResBlock1 unit = dilated conv + d=1 conv -> (d+1)*(k-1)/2 each;
        # ResBlock2 unit = one dilated conv -> d*(k-1)/2 each
        if resblock_type == "2":
            mrf = max(
                sum(d * (rk - 1) // 2 for d in rd)
                for rk, rd in zip(resblock_kernel_sizes, resblock_dilations)
            )
        else:
            mrf = max(
                sum((d + 1) * (rk - 1) // 2 for d in rd)
                for rk, rd in zip(resblock_kernel_sizes, resblock_dilations)
            )
        halo += mrf
        # transposed conv: output position n draws on inputs within
        # ceil((k - 1 - pad) / u) of n//u; then move to the input rate
        pad = (k - u) // 2
        halo = -(-(halo + k - 1 - pad) // u)
    return halo + (pre_kernel - 1) // 2


def vocoder_infer_chunked(
    params,
    mel: jnp.ndarray,
    chunk_frames: int = 256,
    halo_frames: int | None = None,
    hop_length: int = 256,
    gen: HiFiGANGenerator | None = None,
) -> jnp.ndarray:
    """Streaming-style chunked vocoding: sample-exact vs the full forward.

    Splits a (B, T, M) mel into overlapping windows of
    chunk_frames + 2*halo_frames, vocodes them as one larger batch (bounded
    per-step memory/latency — the production path for long or streamed
    sequences), and stitches the center chunk_frames * hop samples of each.

    halo_frames defaults to the generator's true receptive field.
    """
    if gen is None:
        gen = HiFiGANGenerator()
    if halo_frames is None:
        if hasattr(gen, "receptive_halo_frames"):  # e.g. ISTFTNetGenerator
            halo_frames = gen.receptive_halo_frames()
        else:
            halo_frames = receptive_halo_frames(
                gen.upsample_rates, gen.upsample_kernel_sizes,
                gen.resblock_kernel_sizes, gen.resblock_dilations,
                resblock_type=getattr(gen, "resblock_type", "1"))
    b, t, m = mel.shape
    n_chunks = -(-t // chunk_frames)
    t_pad = n_chunks * chunk_frames
    padded = jnp.pad(mel, ((0, 0), (halo_frames, t_pad - t + halo_frames),
                           (0, 0)))
    starts = jnp.arange(n_chunks) * chunk_frames
    win = chunk_frames + 2 * halo_frames
    idx = starts[:, None] + jnp.arange(win)[None, :]           # (N, win)
    windows = padded[:, idx, :]                                # (B, N, win, M)
    wav = _infer(gen, params, windows.reshape(b * n_chunks, win, m))
    wav = wav.reshape(b, n_chunks, win * (
        wav.shape[-1] // win))                                 # (B, N, win*hop)
    hop = wav.shape[-1] // win
    core = wav[:, :, halo_frames * hop: (halo_frames + chunk_frames) * hop]
    return core.reshape(b, t_pad * hop)[:, : t * hop]


def vocoder_infer(params, mels: jnp.ndarray, lengths=None,
                  hop_length: int = 256, gen: HiFiGANGenerator | None = None):
    """Batched mel -> waveform (reference utils/model.py:73-98 semantics,
    Normalize=False path). mels: (B, T, n_mels); returns (B, T*hop) and the
    per-item sample lengths (mel_lens * hop)."""
    if gen is None:
        gen = HiFiGANGenerator()
    wavs = _infer(gen, params, mels)
    if lengths is not None:
        sample_lens = np.asarray(lengths) * hop_length
    else:
        sample_lens = np.full((mels.shape[0],), wavs.shape[1])
    return wavs, sample_lens
