from mmbidaf_tpu.native.loader import (  # noqa: F401
    native_available,
    wav_decode,
    ppm_decode,
    png_decode,
    png_decode_batch,
    pad_waveforms,
    sample_keyframes_batch,
)
