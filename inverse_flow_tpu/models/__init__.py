from .glow import (build_preprocess, build_glow, build_cnn_flow,
                   build_fc_flow)

__all__ = ["build_preprocess", "build_glow", "build_cnn_flow",
           "build_fc_flow"]

from .fastflow import build_fastflow

__all__ += ["build_fastflow"]
