"""C++ native decode runtime vs the Python reference paths (both must agree;
the native path is exercised only when the toolchain built the .so).
"""

import io
import wave as wave_mod

import numpy as np
import pytest

from mmbidaf_tpu.native import (
    native_available,
    pad_waveforms,
    ppm_decode,
    sample_keyframes_batch,
    wav_decode,
)
from mmbidaf_tpu.data.video import sample_keyframes


def _wav_bytes(sig_int16, sr=8000, channels=1):
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(sig_int16.tobytes())
    return buf.getvalue()


def test_native_builds():
    assert native_available(), "C++ native library failed to build/load"


def test_wav_decode_matches_python(rng):
    sig = (rng.standard_normal(5000) * 20000).astype(np.int16)
    data = _wav_bytes(sig)
    wave, sr = wav_decode(data)
    assert sr == 8000 and len(wave) == 5000
    np.testing.assert_allclose(wave, sig.astype(np.float32) / 32768.0, atol=1e-6)


def test_wav_decode_stereo_mix(rng):
    sig = (rng.standard_normal((3000, 2)) * 15000).astype(np.int16)
    data = _wav_bytes(sig.reshape(-1), channels=2)
    wave, sr = wav_decode(data)
    expected = (sig[:, 0].astype(np.float32) + sig[:, 1]) / 2 / 32768.0
    np.testing.assert_allclose(wave, expected, atol=1e-4)


def test_ppm_decode(rng):
    h, w = 7, 5
    pix = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    header = f"P6\n# comment\n{w} {h}\n255\n".encode()
    out = ppm_decode(header + pix.tobytes())
    np.testing.assert_array_equal(out, pix)


def test_pad_waveforms_matches_python(rng):
    waves = [rng.standard_normal(n).astype(np.float32) for n in (100, 50, 130)]
    out = pad_waveforms(waves, 120)
    assert out.shape == (3, 120)
    np.testing.assert_array_equal(out[0, :100], waves[0])
    assert out[1, 50:].sum() == 0
    np.testing.assert_array_equal(out[2], waves[2][:120])


def test_sample_keyframes_batch_matches_python(rng):
    videos = [
        (rng.random((t, 6, 4, 3)) * 255).astype(np.uint8) for t in (10, 3, 17)
    ]
    out, mask = sample_keyframes_batch(videos, 5)
    for b, v in enumerate(videos):
        ref, ref_mask = sample_keyframes(v, 5)
        np.testing.assert_array_equal(out[b], ref)
        np.testing.assert_array_equal(mask[b], ref_mask)


def _png_bytes(img) -> bytes:
    import io

    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_png_decode_variants(rng):
    """Native libpng decode == PIL for RGB/gray/palette/alpha/16-bit PNGs."""
    import io

    from PIL import Image

    from mmbidaf_tpu.native import png_decode

    rgb = Image.fromarray((rng.random((21, 17, 3)) * 255).astype(np.uint8))
    gray = rgb.convert("L")
    pal = rgb.convert("P", palette=Image.ADAPTIVE, colors=16)
    rgba = rgb.convert("RGBA")
    for img in (rgb, gray, pal, rgba):
        data = _png_bytes(img)
        got = png_decode(data)
        want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want, err_msg=img.mode)

    # 16-bit: libpng strip_16 (>>8) is the correct scaling; PIL's
    # convert("RGB") from I;16 CLAMPS at 255 instead, so compare against
    # the raw pixels, not PIL.
    raw16 = (rng.random((9, 11)) * 65535).astype(np.uint16)
    i16 = Image.fromarray(raw16)  # uint16 → mode I;16
    got = png_decode(_png_bytes(i16))
    want = np.repeat((raw16 >> 8).astype(np.uint8)[:, :, None], 3, axis=2)
    np.testing.assert_array_equal(got, want)


def test_png_decode_batch_threaded(rng):
    from PIL import Image

    from mmbidaf_tpu.native import png_decode, png_decode_batch

    blobs = [
        _png_bytes(Image.fromarray((rng.random((8 + i, 12, 3)) * 255).astype(np.uint8)))
        for i in range(6)
    ]
    outs = png_decode_batch(blobs, num_threads=3)
    assert len(outs) == 6
    for i, (o, b) in enumerate(zip(outs, blobs)):
        assert o.shape == (8 + i, 12, 3)
        np.testing.assert_array_equal(o, png_decode(b))


def test_png_decode_malformed_falls_back():
    import pytest

    from mmbidaf_tpu.native import png_decode, png_decode_batch

    with pytest.raises(Exception):
        png_decode(b"not a png at all")  # PIL fallback raises too
    # batch: a bad blob falls back per-image and raises there
    with pytest.raises(Exception):
        png_decode_batch([b"also not a png"])


def test_load_image_dir_uses_native_png(tmp_path, rng):
    from PIL import Image

    from mmbidaf_tpu.data.video import load_image_dir

    for i in range(4):
        arr = (rng.random((10, 14, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"f{i:03d}.png")
    frames = load_image_dir(str(tmp_path))
    assert frames.shape == (4, 10, 14, 3)
    # parity with the PIL path
    want = np.stack([
        np.asarray(Image.open(tmp_path / f"f{i:03d}.png").convert("RGB"))
        for i in range(4)
    ])
    np.testing.assert_array_equal(frames, want)


def test_jpeg_decode_matches_pil(rng):
    """Native libjpeg decode == PIL (same underlying codec) for RGB + gray
    JPEGs, routed through the format-sniffing image_decode."""
    import io

    from PIL import Image

    from mmbidaf_tpu.native import image_decode, image_decode_batch

    def jpg_bytes(img, q=90):
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=q)
        return buf.getvalue()

    rgb = Image.fromarray((rng.random((20, 24, 3)) * 255).astype(np.uint8))
    gray = rgb.convert("L")
    blobs = [jpg_bytes(rgb), jpg_bytes(gray)]
    for b in blobs:
        got = image_decode(b)
        want = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
        assert got.shape == want.shape
        # identical libjpeg under both paths; allow 1 LSB for IDCT variants
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    outs = image_decode_batch(blobs, num_threads=2)
    for o, b in zip(outs, blobs):
        np.testing.assert_array_equal(o, image_decode(b))


def test_load_image_dir_mixed_jpeg_png(tmp_path, rng):
    from PIL import Image

    from mmbidaf_tpu.data.video import load_image_dir

    arrs = [(rng.random((10, 14, 3)) * 255).astype(np.uint8) for _ in range(3)]
    Image.fromarray(arrs[0]).save(tmp_path / "f000.jpg", quality=95)
    Image.fromarray(arrs[1]).save(tmp_path / "f001.png")
    Image.fromarray(arrs[2]).save(tmp_path / "f002.jpeg", quality=95)
    frames = load_image_dir(str(tmp_path))
    assert frames.shape == (3, 10, 14, 3)
    # PNG frame roundtrips exactly; JPEG frames must match PIL's decode of
    # the same file byte-for-byte (JPEG-vs-original loss is huge on noise)
    np.testing.assert_array_equal(frames[1], arrs[1])
    for name, idx in (("f000.jpg", 0), ("f002.jpeg", 2)):
        want = np.asarray(Image.open(tmp_path / name).convert("RGB"))
        np.testing.assert_array_equal(frames[idx], want)


def test_stale_so_rebuilds(tmp_path, monkeypatch):
    """A stale .so (older ABI version) triggers an automatic rebuild instead
    of crashing the symbol bindings — the committed-binary failure mode."""
    import shutil
    import subprocess
    import sys

    from mmbidaf_tpu.native import loader

    # private copy of the native source tree with a v1 stub .so in place
    ndir = tmp_path / "native"
    ndir.mkdir()
    for f in ("mmbidaf_native.cpp", "Makefile"):
        shutil.copy(loader._NATIVE_DIR + "/" + f, ndir / f)
    stub = tmp_path / "stub.cpp"
    stub.write_text('extern "C" int mmb_version() { return 1; }\n')
    so = str(ndir / "libmmbidaf_native.so")
    subprocess.run(["g++", "-shared", "-fPIC", "-o", so, str(stub)], check=True)

    monkeypatch.setattr(loader, "_NATIVE_DIR", str(ndir))
    monkeypatch.setattr(loader, "_SO_PATH", so)
    monkeypatch.setattr(loader, "_lib", None)
    monkeypatch.setattr(loader, "_build_failed", False)
    try:
        lib = loader._load()
        assert lib is not None, "loader did not rebuild the stale .so"
        assert lib.mmb_version() >= loader._MIN_VERSION
    finally:
        monkeypatch.undo()
        loader._lib = None
        loader._build_failed = False


def test_wav_decode_fallback_rejects_24bit(monkeypatch, rng):
    """The stdlib fallback must refuse 24-bit packed PCM (it used to
    reinterpret the 3-byte samples as u8 noise), matching
    data/video.py::load_wav's contract."""
    import io
    import wave as wave_mod

    import pytest

    from mmbidaf_tpu.native import loader as loader_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(16000)
        w.writeframes(b"\x00\x01\x02" * 64)
    monkeypatch.setattr(loader_mod, "_load", lambda: None)  # force fallback
    with pytest.raises(ValueError, match="sample width"):
        loader_mod.wav_decode(buf.getvalue())
