from .feature_extractor import (
    FeatureExtractorBackbone,
    LdmExtractor,
    LdmImplicitCaptionerExtractor,
    PositionalLinear,
    ldm_feature_dims_strides,
)
