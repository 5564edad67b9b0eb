"""Enhancement model families (L4 of the layer map)."""

from flowdec_tpu.models.base import EnhancementModel, PreprocessInfo
from flowdec_tpu.models.features import (
    AmplitudeCompressedComplexSTFT,
    ComplexSTFT,
    CompressAmplitudes,
    FeatureExtractor,
    NoOp,
    Sequential,
)
from flowdec_tpu.models.flow_model import FlowModel
from flowdec_tpu.models.regression_model import RegressionModel
from flowdec_tpu.models.score_model import ScoreModel
from flowdec_tpu.models import sigma as sigma_models

__all__ = [
    "EnhancementModel",
    "PreprocessInfo",
    "AmplitudeCompressedComplexSTFT",
    "ComplexSTFT",
    "CompressAmplitudes",
    "FeatureExtractor",
    "NoOp",
    "Sequential",
    "FlowModel",
    "RegressionModel",
    "ScoreModel",
    "sigma_models",
]
