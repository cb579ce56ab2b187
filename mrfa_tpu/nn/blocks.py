"""Conv blocks and Hourglass (L0 building blocks), NHWC flax modules.

Semantic parity targets: the conv blocks of /root/reference/modules/util.py:
111-278 (SameBlock2d / DownBlock2d / UpBlock2d / ResBlock2d / ChannelBlock2d /
Encoder / Decoder / Hourglass). Submodule names mirror the torch attribute
paths so the mechanical checkpoint converter maps state dicts 1:1.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mrfa_tpu.nn.norm import BatchNorm
from mrfa_tpu.ops.resize import avg_pool, upsample_nearest


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — torch Conv2d/Linear default."""
    fan_in = int(np.prod(shape[:-1]))  # HWIO: h*w*in
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv2d(
    features,
    kernel_size,
    stride=1,
    padding=0,
    groups=1,
    use_bias=True,
    name=None,
):
    """Bare nn.Conv with torch init — used where torch has a raw Conv2d.

    Unlike `Conv` (a wrapper submodule), this attaches parameters directly at
    `name`, matching torch's `<name>.weight` / `<name>.bias` paths.
    """
    from mrfa_tpu.precision import get_compute_dtype

    ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    return nn.Conv(
        features=features,
        kernel_size=ks,
        strides=(stride, stride),
        padding=pad,
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=torch_conv_kernel_init,
        dtype=get_compute_dtype(),
        name=name,
    )


class SpaceToDepthConv(nn.Module):
    """7x7 / pad-3 conv with few output channels via space-to-depth-4.

    A direct 7x7 conv to O=3 channels runs the MXU at 3/128 column
    utilization (0.57 ms/frame at 256^2 in the serving device profile —
    the generator's `final` conv, reference modules/generator.py:36).
    Folding 4x4 spatial blocks into channels turns it into a 3x3 conv with
    16C input / 16O output channels at 1/16 the positions — identical math:
    the rearranged kernel is a fixed gather of the canonical (7,7,C,O)
    kernel, zero-filled where a tap falls outside the 7x7 support, so
    zero-padding semantics are preserved exactly. ~5x fewer MXU-padded
    FLOPs. The parameter stays in canonical torch (7,7,C,O) layout, so
    checkpoint conversion (utils/torch_convert.py) is unaffected.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        from mrfa_tpu.precision import get_compute_dtype

        b, h, w, c = x.shape
        o = self.features
        k, f = 7, 4
        kernel = self.param("kernel", torch_conv_kernel_init, (k, k, c, o))
        bias = self.param("bias", nn.initializers.zeros, (o,))
        dt = get_compute_dtype() or kernel.dtype
        if h % f or w % f:
            # tiny/odd inputs (tests): direct conv, same parameters
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kernel.astype(dt), (1, 1), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(dt)
        # static tap map: canonical tap (u, v) -> s2d kernel tap (kp, kq),
        # input phase (dy, dx), for each output phase (di, dj):
        #   u = 4*(kp-1) + dy + 3 - di  (and likewise v)
        kp, kq, dy, dx, di, dj = np.meshgrid(
            np.arange(3), np.arange(3), np.arange(f), np.arange(f),
            np.arange(f), np.arange(f), indexing="ij",
        )
        u = f * (kp - 1) + dy + (k // 2) - di
        v = f * (kq - 1) + dx + (k // 2) - dj
        valid = (u >= 0) & (u < k) & (v >= 0) & (v < k)
        w4 = kernel[np.clip(u, 0, k - 1), np.clip(v, 0, k - 1)]
        w4 = jnp.where(jnp.asarray(valid)[..., None, None], w4, 0.0)
        # (kp,kq,dy,dx,di,dj,C,O) -> (kp,kq, (dy,dx,C), (di,dj,O))
        w4 = jnp.transpose(w4, (0, 1, 2, 3, 6, 4, 5, 7)).reshape(
            3, 3, f * f * c, f * f * o
        )
        xs = jnp.transpose(
            x.reshape(b, h // f, f, w // f, f, c), (0, 1, 3, 2, 4, 5)
        ).reshape(b, h // f, w // f, f * f * c)
        ys = jax.lax.conv_general_dilated(
            xs.astype(dt), w4.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ys = jnp.transpose(
            ys.reshape(b, h // f, w // f, f, f, o), (0, 1, 3, 2, 4, 5)
        )
        return ys.reshape(b, h, w, o) + bias.astype(dt)


class TapsConv(nn.Module):
    """Stride-1 conv computed as tap matmuls, for MXU-hostile channel shapes.

    XLA's TPU conv emitters run the MXU at O/128 (or ~k*k*C/128) column
    utilization when the output (or input) channel count is tiny: the
    serving frame profile showed 7x7 2->128 (BasicMotionEncoder.convf1),
    3x3 128->2 (RefineFlow.conv2) and 7x7 108->11 (DenseMotion.mask)
    costing 0.1-0.2 ms each at 1-5% MFU. Two exact re-associations:

      - mode 'in' (tiny k*k*C): one im2col concat of the k*k shifted input
        slices, then a single [N, k*k*C] @ [k*k*C, O] matmul.
      - mode 'out' (tiny O): one [N, C] @ [C, k*k*O] per-tap projection
        matmul, then a sum of k*k shifted slices (a cheap VPU fusion).

    Both accumulate in f32 and only differ from lax.conv by summation
    order. The parameter structure is identical to conv2d/nn.Conv
    ((kh, kw, in, out) 'kernel' + 'bias' at this module's name), so
    checkpoint conversion (utils/torch_convert.py) and the torch-mirror
    naming invariant are unaffected.
    """

    features: int
    kernel_size: int
    padding: int
    mode: str  # 'in' | 'out'
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from mrfa_tpu.precision import get_compute_dtype

        k, p, o = self.kernel_size, self.padding, self.features
        b, h, w, c = x.shape
        kernel = self.param("kernel", torch_conv_kernel_init, (k, k, c, o))
        dt = get_compute_dtype() or x.dtype
        xd = x.astype(dt)
        kd = kernel.astype(dt)
        if self.mode == "in":
            xp = jnp.pad(xd, ((0, 0), (p, p), (p, p), (0, 0)))
            cols = jnp.concatenate(
                [xp[:, i:i + h, j:j + w, :] for i in range(k) for j in range(k)],
                axis=-1,
            )
            y = jnp.einsum(
                "bhwk,kf->bhwf", cols, kd.reshape(k * k * c, o),
                preferred_element_type=jnp.float32,
            )
        else:
            k2 = jnp.transpose(kd, (2, 0, 1, 3)).reshape(c, k * k * o)
            t = jnp.einsum(
                "bhwc,cf->bhwf", xd, k2, preferred_element_type=jnp.float32
            ).reshape(b, h, w, k, k, o)
            tp = jnp.pad(
                t, ((0, 0), (p, p), (p, p), (0, 0), (0, 0), (0, 0))
            )
            # out[y, x] = sum_{i,j} t[y + i - p, x + j - p, i, j]
            y = tp[:, 0:h, 0:w, 0, 0, :]
            for i in range(k):
                for j in range(k):
                    if i == 0 and j == 0:
                        continue
                    y = y + tp[:, i:i + h, j:j + w, i, j, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (o,))
            y = y + bias.astype(jnp.float32)
        return y.astype(dt)


def conv2d_taps(features, kernel_size, padding=0, mode="out", use_bias=True,
                name=None):
    """TapsConv with the conv2d call signature (stride 1, groups 1)."""
    return TapsConv(
        features=features, kernel_size=kernel_size, padding=padding,
        mode=mode, use_bias=use_bias, name=name,
    )


def dense(features, use_bias=True, name=None):
    from mrfa_tpu.precision import get_compute_dtype

    return nn.Dense(
        features=features,
        use_bias=use_bias,
        kernel_init=torch_conv_kernel_init,
        dtype=get_compute_dtype(),
        name=name,
    )


class SameBlock2d(nn.Module):
    """conv -> BN -> relu, preserving resolution."""

    out_features: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv2d(
            self.out_features, self.kernel_size, padding=self.padding,
            groups=self.groups, name="conv",
        )(x)
        x = BatchNorm(self.out_features, name="norm")(x, train)
        return jax.nn.relu(x)


class DownBlock2d(nn.Module):
    """conv -> BN -> relu -> 2x avg-pool."""

    out_features: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv2d(
            self.out_features, self.kernel_size, padding=self.padding,
            groups=self.groups, name="conv",
        )(x)
        x = BatchNorm(self.out_features, name="norm")(x, train)
        x = jax.nn.relu(x)
        return avg_pool(x, 2)


class UpBlock2d(nn.Module):
    """2x nearest upsample -> conv -> BN -> relu."""

    out_features: int
    kernel_size: int = 3
    padding: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = upsample_nearest(x, 2)
        x = conv2d(
            self.out_features, self.kernel_size, padding=self.padding,
            groups=self.groups, name="conv",
        )(x)
        x = BatchNorm(self.out_features, name="norm")(x, train)
        return jax.nn.relu(x)


class ResBlock2d(nn.Module):
    """Pre-activation residual block preserving channels and resolution."""

    features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = BatchNorm(self.features, name="norm1")(x, train)
        out = jax.nn.relu(out)
        out = conv2d(self.features, self.kernel_size, padding=self.padding, name="conv1")(out)
        out = BatchNorm(self.features, name="norm2")(out, train)
        out = jax.nn.relu(out)
        out = conv2d(self.features, self.kernel_size, padding=self.padding, name="conv2")(out)
        return out + x


class ChannelBlock2d(nn.Module):
    """BN -> relu -> conv halving the channel count."""

    in_features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = BatchNorm(self.in_features, name="norm1")(x, train)
        out = jax.nn.relu(out)
        return conv2d(
            self.in_features // 2, self.kernel_size, padding=self.padding, name="conv1"
        )(out)


class Encoder(nn.Module):
    """Hourglass encoder: num_blocks DownBlocks, doubling channels to a cap."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, x, train: bool):
        outs = [x]
        for i in range(self.num_blocks):
            out_feats = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            blk = DownBlock2d(out_feats, kernel_size=3, padding=1, name=f"down_blocks_{i}")
            outs.append(blk(outs[-1], train))
        return outs


class Decoder(nn.Module):
    """Hourglass decoder with skip concat; out channels = expansion + input."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @property
    def out_filters(self) -> int:
        return self.block_expansion + self.in_features

    @nn.compact
    def __call__(self, feats, train: bool):
        feats = list(feats)
        out = feats.pop()
        for idx, i in enumerate(reversed(range(self.num_blocks))):
            out_feats = min(self.max_features, self.block_expansion * (2**i))
            blk = UpBlock2d(out_feats, kernel_size=3, padding=1, name=f"up_blocks_{idx}")
            out = blk(out, train)
            skip = feats.pop()
            out = jnp.concatenate([out, skip], axis=-1)
        return out


def hourglass_out_filters(block_expansion: int, in_features: int) -> int:
    return block_expansion + in_features


class Hourglass(nn.Module):
    """U-Net with skip concatenation (encoder + decoder)."""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @property
    def out_filters(self) -> int:
        return self.block_expansion + self.in_features

    @nn.compact
    def __call__(self, x, train: bool):
        feats = Encoder(
            self.block_expansion, self.in_features, self.num_blocks,
            self.max_features, name="encoder",
        )(x, train)
        return Decoder(
            self.block_expansion, self.in_features, self.num_blocks,
            self.max_features, name="decoder",
        )(feats, train)
