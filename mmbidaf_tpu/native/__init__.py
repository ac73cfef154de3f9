from mmbidaf_tpu.native.loader import (  # noqa: F401
    native_available,
    wav_decode,
    ppm_decode,
    image_decode,
    image_decode_batch,
    png_decode,
    png_decode_batch,
    pad_waveforms,
    sample_keyframes_batch,
)
