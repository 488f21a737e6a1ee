"""ResNet-50 (DC5) backbone in Flax, NHWC, frozen BatchNorm.

Functionally equivalent to the reference's vendored torchvision ResNet
(reference models/resnet.py:1-413) with FrozenBatchNorm2d
(models/backbone.py:22-60) and DC5 dilation
(replace_stride_with_dilation=[False, False, True], backbone.py:96-101):

  * all convs use EXPLICIT torch-style symmetric padding, not XLA 'SAME',
    so imported torch weights reproduce activations exactly;
  * FrozenBN keeps the four torch buffers (weight/bias/running_mean/var) so
    .pth checkpoints import losslessly; it is an affine op, XLA fuses it
    into the surrounding convs;
  * torchvision's _make_layer dilation quirk is preserved: the FIRST block of
    a dilated stage uses the PREVIOUS dilation (1), later blocks use 2.

Padding invariance: the reference runs batch=1 and never pads
(reference main.py:34), so it never faces this; we batch via (H, W) buckets,
so the backbone re-zeroes the padded region before every SPATIAL conv
(the 7x7 stem / maxpool and each bottleneck 3x3). Zero image padding then
behaves exactly like the convs' own zero padding, making features on the
valid region bit-identical regardless of bucket — tested by
tests/test_model.py::test_padding_invariance. Pointwise 1x1 convs and the
frozen BNs need no masking. With no padding mask (or an all-valid one) this
is the identity, so single-image parity with the reference is unaffected.

Layer trainability (reference backbone.py:66-68: only layer2/3/4 get
gradients, at lr_backbone) is handled by the optimizer mask in
train/optimizer.py, not here.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """y = x * weight/sqrt(var+eps) + (bias - mean*weight/sqrt(var+eps)).

    The affine factors are always computed in fp32; the elementwise apply
    happens in the activation dtype (bf16 under the production policy)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        rm = self.param("running_mean", nn.initializers.zeros, (self.features,))
        rv = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = w * jnp.reciprocal(jnp.sqrt(rv + self.eps))
        bias = b - rm * scale
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _conv(features, kernel, stride=1, dilation=1, name=None, dtype=None):
    pad = (kernel // 2) * dilation
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        name=name,
        dtype=dtype,
    )


def _apply_valid(x, valid):
    """Zero out padded pixels. valid: (B, H, W) float {0,1} or None."""
    if valid is None:
        return x
    return x * valid[..., None]


class StemConv(nn.Module):
    """The 7x7/s2 stem conv, with a 2x2 space-to-depth formulation.

    Three input forms:
      * (B, H, W, 3) — the direct 7x7/s2 convolution (default);
      * (B, H, W, 3) with COUNTDETR_S2D_STEM=1 — pack to s2d ON DEVICE then
        run the 4x4/s1 form. MEASURED a ~2% end-to-end regression on v5e
        (532.2 -> 521.4 img/s): the device-side repack itself pays the
        3-channel-minor layout tax the rewrite is meant to avoid. Kept for
        experiments only;
      * (B, H/2, W/2, 12) — input ALREADY s2d-packed by the host pipeline
        (data/batching.py::pack_space_to_depth). This is the production
        path: the round-5 profile showed the direct stem at 9.0 ms/forward
        (B=32, 592px) because C_in=3 fills 3 of 128 MXU lanes; with the
        host-packed 12-channel input the same linear map runs as a 4x4/s1
        conv with no device-side repack.

    The rewrite is exact: y[i,j,(a,b,c)] = x[2i+a,2j+b,c],
    W'[t,s,(a,b,c),o] = W[2t+a-1, 2s+b-1, c, o] (zero where the index
    leaves [0,7)), output positions r = p+t-2 => padding (2,1). The
    parameter keeps the reference's (7,7,3,64) layout in every form, so
    torch-checkpoint import (train/checkpoints.py) is unaffected;
    tests/test_stem_s2d.py pins all three forms against each other.
    """

    dtype: object = None

    @nn.compact
    def __call__(self, x):
        import os

        import jax

        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64)
        ).astype(x.dtype)
        B, H, W, C = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        if C == 3:
            if (
                H % 2 or W % 2
                or os.environ.get("COUNTDETR_S2D_STEM", "0") != "1"
            ):
                return jax.lax.conv_general_dilated(
                    x, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn
                )
            x = (
                x.reshape(B, H // 2, 2, W // 2, 2, 3)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(B, H // 2, W // 2, 12)
            )
        else:
            assert C == 12, f"StemConv expects 3 or 12 channels, got {C}"
        # W[u] at u = 2t+a-1: pad u by 1 on the low side then split even/odd
        kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, 3, 64)
        ks = (
            kp.reshape(4, 2, 4, 2, 3, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 12, 64)
        )
        return jax.lax.conv_general_dilated(
            x, ks, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn
        )


class Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3 conv)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, valid=None):
        identity = x
        out = _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        # re-zero padding so the spatial conv's receptive field matches the
        # unpadded image exactly (valid is at this input resolution)
        out = _apply_valid(out, valid)
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv2",
                    dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride,
                             name="downsample_conv", dtype=self.dtype)(x)
            identity = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """ResNet-50; returns the C5 feature map (stride 16 with dilation=True).

    pad_mask: optional (B, H, W) bool at IMAGE resolution, True on padding.
    return_interm: also return C3/C4 (for num_feature_levels > 1).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    dilation: bool = True  # DC5
    return_interm: bool = False
    return_c2: bool = False  # also return C2 (mask head's finest fpn skip)
    dtype: object = None  # compute dtype for convs (e.g. jnp.bfloat16)

    @nn.compact
    def __call__(
        self, x, pad_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, ...]:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # valid masks at each feature resolution the spatial convs see
        def valid_at(h, w):
            if pad_mask is None:
                return None
            return (~downsample_mask(pad_mask, h, w)).astype(x.dtype)

        x = StemConv(dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        # mask before maxpool: relu output >= 0, padded zeros never win the max
        x = _apply_valid(x, valid_at(x.shape[1], x.shape[2]))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        planes = (64, 128, 256, 512)
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            dilate = self.dilation and stage == 3
            # torchvision _make_layer: with dilate, the first block keeps the
            # previous dilation (1) and stride becomes 1; later blocks dilate.
            first_dil, rest_dil = 1, 1
            if dilate:
                stride, first_dil, rest_dil = 1, 1, 2
            for i in range(self.layers[stage]):
                v = valid_at(x.shape[1], x.shape[2])
                x = Bottleneck(
                    planes=planes[stage],
                    stride=stride if i == 0 else 1,
                    dilation=first_dil if i == 0 else rest_dil,
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, v)
            feats.append(x)

        if self.return_interm:
            if self.return_c2:
                return tuple(feats)  # C2, C3, C4, C5
            return tuple(feats[1:])  # C3, C4, C5
        return (feats[-1],)


def downsample_mask(pad_mask: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbour downsample of the (B, H, W) bool padding mask to the
    feature resolution — same as the reference's F.interpolate(mode='nearest')
    (backbone.py:85)."""
    B, H, W = pad_mask.shape
    yi = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
    xi = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
    return pad_mask[:, yi][:, :, xi]
