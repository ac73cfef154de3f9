"""mmbidaf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal BiDAF framework.

A from-scratch rebuild of the capabilities of ``amankhullar/MMBiDAF``
(extractive video summarization via trimodal bidirectional attention flow),
designed TPU-first:

- all recurrence as ``jax.lax.scan`` with fused-gate GEMMs (MXU-friendly),
- attention / audio-frontend hot paths as fused Pallas kernels,
- static shapes + masks everywhere (bucketed padding),
- batch parallelism over a ``jax.sharding.Mesh`` via NamedSharding/pjit,
- on-device preprocessing (mel/MFCC via matmul-DFT, VGG-style conv stack,
  GloVe lookup) so raw features → summary runs as one compiled program.

Reference provenance: the reference mount is empty (see SURVEY.md §0); the
behavioral spec is SURVEY.md, which this package cites by section.
"""

__version__ = "0.2.0"

from mmbidaf_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    config_from_json,
)


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax-heavy modules eagerly).
    if name == "Summarizer":
        from mmbidaf_tpu.serving import Summarizer

        return Summarizer
    raise AttributeError(name)
