from nice_slam_tpu.models.decoders import (
    DecoderConfig,
    init_nice_decoders,
    init_imap_decoder,
    nice_eval,
    imap_eval,
    STAGES,
)
from nice_slam_tpu.models.grids import GridConfig, init_grids, grid_shapes
