from mmbidaf_tpu.native.loader import (  # noqa: F401
    native_available,
    wav_decode,
    ppm_decode,
    pad_waveforms,
    sample_keyframes_batch,
)
