"""Motion-autoencoder image encoder (StyleGAN2-style downsampling pyramid).

Functional re-design of the reference Encoder/EncoderApp
(reference: src/nodes/models/float/encoder.py:202-281).

Params are nested dicts whose key paths mirror the reference checkpoint's
``motion_autoencoder.enc.*`` torch state_dict hierarchy, so safetensors load
is a pure key-split (see float_tpu.io.checkpoint).  Layout (torch shapes):

    net_app.convs.0.0.weight        EqualConv2d(3 -> C(size), k1)
    net_app.convs.0.1.bias          FusedLeakyReLU bias (1, C, 1, 1)
    net_app.convs.{i}.conv1.0.weight / .conv1.1.bias          (ResBlock)
    net_app.convs.{i}.conv2.1.weight / .conv2.2.bias          (blur at .0)
    net_app.convs.{i}.skip.1.weight                           (blur at .0)
    net_app.convs.{N}.weight        final EqualConv2d(C, w_dim, k4, no pad)
    fc.{0..4}.weight / .bias        EqualLinear stack (dim -> ... -> dim_m)

Returns of :func:`encoder_app`: the appearance code (B, w_dim) plus the 7
skip feature maps ordered coarse→fine (8² … 512² for size=512) exactly as
``res[::-1][2:]`` does in the reference.
"""
from __future__ import annotations

import math

from ..ops import equal_conv2d, fused_leaky_relu, upfirdn2d, make_blur_kernel, equal_linear

_SQRT2 = math.sqrt(2.0)


def _conv_layer(x, p, kernel_size: int, downsample: bool, activate: bool = True,
                blur_kernel=(1, 3, 3, 1)):
    """ConvLayer: optional FIR-blur + stride-2 conv, optional fused lrelu.

    Sequential indices mirror torch: with downsample the EqualConv2d sits at
    index 1 (blur at 0), otherwise at 0; the activation bias follows it.
    """
    if downsample:
        factor = 2
        p_len = (len(blur_kernel) - factor) + (kernel_size - 1)
        pad0 = (p_len + 1) // 2
        pad1 = p_len // 2
        k = make_blur_kernel(blur_kernel)
        x = upfirdn2d(x, k, pad=(pad0, pad1))
        conv_idx, stride, padding = 1, 2, 0
    else:
        conv_idx, stride, padding = 0, 1, kernel_size // 2

    w = p[str(conv_idx)]["weight"]
    has_act_bias = activate
    x = equal_conv2d(x, w, bias=None if has_act_bias else p[str(conv_idx)].get("bias"),
                     stride=stride, padding=padding)
    if activate:
        b = p[str(conv_idx + 1)]["bias"].reshape(-1)
        x = fused_leaky_relu(x, b)
    return x


def _res_block(x, p):
    """ResBlock: conv1(k3) -> conv2(k3, down) + skip(k1, down), /sqrt(2)."""
    out = _conv_layer(x, p["conv1"], 3, downsample=False)
    out = _conv_layer(out, p["conv2"], 3, downsample=True)
    skip = _conv_layer(x, p["skip"], 1, downsample=True, activate=False)
    return (out + skip) / _SQRT2


def encoder_app(params, x, size: int, w_dim: int = 512):
    """Image (B, 3, S, S) in [-1, 1] -> (appearance (B, w_dim), feats list).

    feats are the per-level activations coarse-first:
    [8²(512ch), 16²(512), 32²(512), 64²(256), 128²(128), 256²(64), 512²(32)]
    for size=512 (shape table: reference doc/encoder.md:7-18).
    """
    log_size = int(math.log2(size))
    convs = params["convs"]

    res = []
    h = _conv_layer(x, convs["0"], 1, downsample=False)
    res.append(h)
    n_res = log_size - 2
    for i in range(n_res):
        h = _res_block(h, convs[str(i + 1)])
        res.append(h)
    # final 4x4 -> 1x1 conv, no padding, no bias, no activation
    final = convs[str(n_res + 1)]
    h = equal_conv2d(h, final["weight"], stride=1, padding=0)
    res.append(h)

    appearance = h.reshape(h.shape[0], -1)          # (B, w_dim), squeeze 1x1
    feats = res[::-1][2:]                           # drop 1x1 & 4x4, coarse-first
    return appearance, feats


def encoder_fc(params, h):
    """Motion head: 5 EqualLinear layers (w_dim -> ... -> dim_m), no activation."""
    for i in range(5):
        p = params[str(i)]
        h = equal_linear(h, p["weight"], p["bias"])
    return h


def encode_image(params, x, size: int, w_dim: int = 512):
    """Full Encoder forward: returns (appearance, r_s_lambda, feats).

    Mirrors FLOAT.encode_image_into_latent (reference FLOAT.py:88-92).
    """
    appearance, feats = encoder_app(params["net_app"], x, size, w_dim)
    r_s_lambda = encoder_fc(params["fc"], appearance)
    return appearance, r_s_lambda, feats
