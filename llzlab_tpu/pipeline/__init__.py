"""Chain composition and streaming execution (SURVEY.md layer T4)."""

from llzlab_tpu.pipeline.chain import (  # noqa: F401
    Chain,
    Stage,
    FIRStage,
    SOSStage,
    ResampleStage,
    FusedFirResampleStage,
    SpectralGainStage,
    FFTStage,
    LambdaStage,
)
