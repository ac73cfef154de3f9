"""VGG-style keyframe featurizer in JAX (SURVEY.md §3.2 row 4).

The reference featurizes keyframes with a pretrained torchvision VGG-16
(fc-layer 4096-d features). Here the conv stack is XLA convs
(``lax.conv_general_dilated``) with a spec-driven architecture:
``VGG16_SPEC`` reproduces torchvision's ``vgg16().features`` layout (so
pretrained torchvision weights port 1:1 via ``port_vgg``), and small specs
serve tests. Features are taken at the classifier's fc2 (4096-d after ReLU),
the standard VGG feature layer.

TPU notes: NHWC layout (TPU-preferred), convs run on the MXU; the whole
forward is jittable and batched over all keyframes of all videos at once
(``[B*T_img, H, W, 3]``).
"""

from __future__ import annotations

from functools import partial
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 config "D": numbers = out-channels of 3x3 convs, "M" = maxpool.
VGG16_SPEC: tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                     512, 512, 512, "M", 512, 512, 512, "M")
# torchvision vgg19 config "E" (one extra conv per 256/512 block).
VGG19_SPEC: tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                     512, 512, 512, 512, "M", 512, 512, 512, 512, "M")
# Tiny spec for unit tests (2 blocks).
TINY_SPEC: tuple = (8, "M", 16, "M")

# ModelConfig.vgg_variant values (single source of truth for CLI choices).
VARIANTS: tuple = ("tiny", "vgg16", "vgg19")


def spec_for_variant(name: str) -> tuple:
    """``ModelConfig.vgg_variant`` → conv spec. The fc/classifier shape is
    the same for every variant (fc_dim-d features), so the variant only
    selects the conv stack; ``port_vgg`` imports the matching torchvision
    state_dict (``vgg16``/``vgg19``) unchanged."""
    specs = {"tiny": TINY_SPEC, "vgg16": VGG16_SPEC, "vgg19": VGG19_SPEC}
    try:
        return specs[name]
    except KeyError:
        raise ValueError(
            f"unknown vgg_variant {name!r}: expected one of {VARIANTS}"
        ) from None

# ImageNet normalization (torchvision transforms convention).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def vgg_init(
    key: jax.Array,
    spec: Sequence = VGG16_SPEC,
    image_size: int = 224,
    fc_dim: int = 4096,
    in_channels: int = 3,
    dtype=jnp.float32,
) -> dict:
    """Initialize conv stack + fc1/fc2 params (He-normal convs)."""
    convs = []
    c_in = in_channels
    size = image_size
    for item in spec:
        if item == "M":
            size //= 2
            continue
        key, k = jax.random.split(key)
        fan_in = 3 * 3 * c_in
        w = jax.random.normal(k, (3, 3, c_in, item), dtype) * jnp.sqrt(2.0 / fan_in)
        convs.append({"w": w, "b": jnp.zeros((item,), dtype)})
        c_in = item
    flat = size * size * c_in
    key, k1, k2 = jax.random.split(key, 3)
    bound1 = 1.0 / np.sqrt(flat)
    bound2 = 1.0 / np.sqrt(fc_dim)
    return {
        "convs": convs,
        "fc1_w": jax.random.uniform(k1, (flat, fc_dim), dtype, -bound1, bound1),
        "fc1_b": jnp.zeros((fc_dim,), dtype),
        "fc2_w": jax.random.uniform(k2, (fc_dim, fc_dim), dtype, -bound2, bound2),
        "fc2_b": jnp.zeros((fc_dim,), dtype),
    }


def _conv(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _maxpool2(x: jax.Array) -> jax.Array:
    """2×2 stride-2 max pool via ``reduce_window``. Round-3 measured note:
    the pools are ~10.7 ms of the 111 ms batch-32 serving program, at the
    HBM roof for their traffic (read X + write X/4) — XLA fuses the
    preceding conv's bias+ReLU into this op's input side already. An
    elementwise max-of-four-strided-views formulation (hoping for consumer
    fusion) was measured 13 ms SLOWER e2e (XLA materializes the views);
    eliminating the pool read entirely requires fusing the pool into the
    producing conv, which loses with hand Pallas convs (docs/KERNELS.md) —
    reduce_window stands as the measured optimum."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@partial(jax.jit, static_argnames=("spec", "winograd"))
def vgg_features(
    params: dict,
    images: jax.Array,
    spec: Sequence = VGG16_SPEC,
    winograd: bool = False,
) -> jax.Array:
    """``[N, H, W, 3] float images → [N, fc_dim]`` fc2-ReLU features.

    The flatten before fc1 uses torch's NCHW element order so ported
    torchvision classifier weights line up. ``winograd=True`` runs every
    conv with C_in ≥ 32 via Winograd F(2x2,3x3) (ops/winograd.py — 2.25x
    fewer MACs; the 3-channel stem stays on the direct conv).
    """
    from mmbidaf_tpu.ops.winograd import winograd_conv3x3

    x = images
    ci = 0
    for item in spec:
        if item == "M":
            x = _maxpool2(x)
        else:
            w = params["convs"][ci]["w"]
            b = params["convs"][ci]["b"]
            if winograd and w.shape[2] >= 32:
                x = jax.nn.relu(winograd_conv3x3(x, w, b))
            else:
                x = jax.nn.relu(_conv(x, w, b))
            ci += 1
    # NHWC → NCHW flatten order for torch classifier-weight compatibility.
    n = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
    x = jax.nn.relu(x @ params["fc1_w"] + params["fc1_b"])
    x = jax.nn.relu(x @ params["fc2_w"] + params["fc2_b"])
    return x


def resize_matrix(dst: int, src: int) -> jax.Array:
    """``[dst, src]`` separable bilinear resize weights — exactly
    ``jax.image.resize``'s (antialiased, half-pixel) kernel, extracted by
    resizing an identity along one axis. Constant-folded under jit."""
    if dst == src:
        return jnp.eye(src, dtype=jnp.float32)
    return jax.image.resize(
        jnp.eye(src, dtype=jnp.float32), (dst, src), method="bilinear"
    )


def preprocess_frames(
    frames_uint8: jax.Array, image_size: int, dtype=jnp.float32
) -> jax.Array:
    """Raw ``[N, H, W, 3] uint8`` frames → normalized ``[N, S, S, 3]`` floats.

    Device-side resize + ImageNet normalization — the reference's host-side
    OpenCV/PIL resize moved into the jitted graph [B:5 "keyframe resize …
    in JAX"]. The separable bilinear resize runs as TWO MXU contractions
    against small constant weight matrices (same numerics as
    ``jax.image.resize`` — see ``resize_matrix``), with the uint8 convert,
    the /255 scale (folded into the W-axis matrix) and the normalization
    fused into the GEMMs' epilogues by XLA. Round-3 profile: the previous
    gather-based resize chain cost ~2.6 ms of the 111 ms batch (incl. a
    0.8 ms pure layout copy); the GEMM form removes the extra passes.
    ``dtype=bfloat16`` halves the traffic (memory-bound).
    """
    n, h, w, _ = frames_uint8.shape
    s = image_size
    rw = (resize_matrix(s, w) / 255.0).astype(dtype)  # [S, W], /255 folded in
    rh = resize_matrix(s, h).astype(dtype)            # [S, H]
    x = frames_uint8.astype(dtype)
    x = jnp.einsum("nhwc,kw->nhkc", x, rw)            # W-axis first (smaller tmp)
    x = jnp.einsum("nhkc,sh->nskc", x, rh)
    mean = IMAGENET_MEAN.astype(dtype)
    std = IMAGENET_STD.astype(dtype)
    return (x - mean) / std


def port_vgg(sd: Mapping[str, np.ndarray], spec: Sequence = VGG16_SPEC) -> dict:
    """torchvision ``vgg16`` state_dict (numpy) → our params.

    torchvision layout: ``features.{i}.weight`` OIHW convs at the indices
    implied by the spec (conv,relu pairs + pools), ``classifier.0/3`` fc1/fc2.
    """
    convs = []
    idx = 0
    for item in spec:
        if item == "M":
            idx += 1
            continue
        w = np.asarray(sd[f"features.{idx}.weight"])  # [O, I, kh, kw]
        b = np.asarray(sd[f"features.{idx}.bias"])
        convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)})
        idx += 2  # conv + relu
    return {
        "convs": convs,
        "fc1_w": jnp.asarray(np.asarray(sd["classifier.0.weight"]).T),
        "fc1_b": jnp.asarray(np.asarray(sd["classifier.0.bias"])),
        "fc2_w": jnp.asarray(np.asarray(sd["classifier.3.weight"]).T),
        "fc2_b": jnp.asarray(np.asarray(sd["classifier.3.bias"])),
    }
