"""VGG tower parity vs a torch model with torchvision's state_dict layout
(torchvision itself is not installed — SURVEY.md §0/§5 — so the oracle is a
torch.nn stack with identical keys; the port path is what's under test).
"""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from mmbidaf_tpu.ops import vgg

ATOL = 1e-4


def _torch_vgg(spec, image_size, fc_dim, in_channels=3):
    """Build a torch VGG with torchvision's state_dict key layout."""
    layers = []
    c_in = in_channels
    size = image_size
    for item in spec:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
            size //= 2
        else:
            layers.append(nn.Conv2d(c_in, item, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            c_in = item
    features = nn.Sequential(*layers)
    classifier = nn.Sequential(
        nn.Linear(size * size * c_in, fc_dim),
        nn.ReLU(),
        nn.Dropout(0.0),
        nn.Linear(fc_dim, fc_dim),
        nn.ReLU(),
    )

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.classifier = classifier

        def forward(self, x):
            x = self.features(x)
            x = torch.flatten(x, 1)
            return self.classifier(x)

    return VGG().eval()


def test_vgg_tiny_parity(rng):
    torch.manual_seed(5)
    spec, size, fc = vgg.TINY_SPEC, 16, 32
    tm = _torch_vgg(spec, size, fc)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = vgg.port_vgg(sd, spec)

    x = rng.standard_normal((3, size, size, 3)).astype(np.float32)
    ours = vgg.vgg_features(params, jnp.asarray(x), spec)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=ATOL)


def test_vgg16_spec_shapes():
    """VGG16 spec produces 13 convs and the canonical 25088→4096 classifier."""
    convs = [s for s in vgg.VGG16_SPEC if s != "M"]
    assert len(convs) == 13
    assert convs[-1] == 512
    # 224 / 2^5 = 7 → flat dim 512*7*7 = 25088
    import jax

    params = vgg.vgg_init(jax.random.key(0), vgg.VGG16_SPEC, image_size=224)
    assert params["fc1_w"].shape == (25088, 4096)


def test_preprocess_frames_resize_and_normalize(rng):
    frames = (rng.random((2, 10, 12, 3)) * 255).astype(np.uint8)
    out = vgg.preprocess_frames(jnp.asarray(frames), 8)
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_preprocess_matmul_resize_matches_jax_image(rng):
    """The GEMM-form separable resize == jax.image.resize bilinear (f32),
    including the downscale antialias kernel — preprocess_frames changed
    form, not numerics (round-3 perf work)."""
    import jax
    import jax.numpy as jnp_

    frames = (rng.random((3, 17, 23, 3)) * 255).astype(np.uint8)
    got = vgg.preprocess_frames(jnp_.asarray(frames), 8, dtype=jnp_.float32)
    x = jnp_.asarray(frames).astype(jnp_.float32) / 255.0
    ref = jax.image.resize(x, (3, 8, 8, 3), method="bilinear")
    ref = (ref - vgg.IMAGENET_MEAN) / vgg.IMAGENET_STD
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # upscale path too (no antialias branch)
    got_up = vgg.preprocess_frames(jnp_.asarray(frames), 32, dtype=jnp_.float32)
    ref_up = jax.image.resize(x, (3, 32, 32, 3), method="bilinear")
    ref_up = (ref_up - vgg.IMAGENET_MEAN) / vgg.IMAGENET_STD
    np.testing.assert_allclose(
        np.asarray(got_up), np.asarray(ref_up), rtol=1e-5, atol=1e-5
    )


def test_vgg19_parity(rng):
    """torchvision config-"E" layout: port_vgg imports a vgg19-layout
    state_dict (16 convs, extra conv per 256/512 block) and the forward
    matches torch. Image 32 keeps the full-width conv stack fast on CPU."""
    torch.manual_seed(7)
    spec, size, fc = vgg.VGG19_SPEC, 32, 64
    tm = _torch_vgg(spec, size, fc)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = vgg.port_vgg(sd, spec)
    assert len(params["convs"]) == 16

    x = rng.standard_normal((2, size, size, 3)).astype(np.float32)
    ours = vgg.vgg_features(params, jnp.asarray(x), spec)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=5e-4)


def test_spec_for_variant():
    assert vgg.spec_for_variant("tiny") is vgg.TINY_SPEC
    assert vgg.spec_for_variant("vgg16") is vgg.VGG16_SPEC
    assert vgg.spec_for_variant("vgg19") is vgg.VGG19_SPEC
    import pytest

    with pytest.raises(ValueError, match="vgg19"):
        vgg.spec_for_variant("vgg20")
    # every advertised variant resolves
    for name in vgg.VARIANTS:
        assert vgg.spec_for_variant(name)
