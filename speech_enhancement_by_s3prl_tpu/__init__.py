"""TPU-native speech-enhancement framework (S3PRL-downstream-compatible).

See docs/COMPONENT_MAP.md for the 1:1 mapping between the reference's
component inventory (SURVEY.md section 2) and this package's modules.
"""

__version__ = "0.1.0"

from .data.datasets import (  # noqa: F401
    ACTIVE_BUFFER_NUM,
    NoisyCleanDataset,
    OnlineDataset,
    PseudoDataset,
    filestrs2list,
)
from .models.heads import LSTM, Linear, LinearResidual, Residual, build_head  # noqa: F401
from .objectives import build_objective  # noqa: F401
from .ops.features import OnlinePreprocessor, get_feat_config  # noqa: F401
