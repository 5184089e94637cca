from .model import (
    CLIP,
    CLIP_CONFIGS,
    CLIP_PIXEL_MEAN,
    CLIP_PIXEL_STD,
    TextTransformer,
    VisionTransformer,
    create_clip,
)
from .tokenizer import SimpleTokenizer, tokenize, default_tokenizer
from .adapter import (
    EmbeddedImage,
    EmbeddedText,
    build_mask_attn_mask,
    build_mask_reader_mask,
    build_text_embed,
    clip_preprocess,
    embed_image,
    embed_text,
)
