from .layers import MLP, MultiheadAttention, position_embedding_sine
from .pixel_decoder import MSDeformAttn, MSDeformAttnPixelDecoder
from .transformer_decoder import (
    MaskFormerHead,
    ODISEMultiScaleMaskedTransformerDecoder,
    PooledMaskEmbed,
    PseudoClassEmbed,
)
