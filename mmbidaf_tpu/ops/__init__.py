from mmbidaf_tpu.ops.masked import masked_softmax, mask_logits  # noqa: F401
from mmbidaf_tpu.ops.highway import highway_init, highway_apply  # noqa: F401
from mmbidaf_tpu.ops.lstm import (  # noqa: F401
    lstm_init,
    bilstm_init,
    lstm_scan,
    bilstm_apply,
    stacked_bilstm_init,
    stacked_bilstm_apply,
)
from mmbidaf_tpu.ops.bidaf import bidaf_init, bidaf_apply  # noqa: F401
