from mmbidaf_tpu.models.embedding import embedding_init, embedding_apply  # noqa: F401
from mmbidaf_tpu.models.mmbidaf import (  # noqa: F401
    mmbidaf_init,
    mmbidaf_apply,
    mmbidaf_decode,
)
