from . import helper, inference
from .odise import (
    CLIPOpenClassEmbed,
    CaptionODISE,
    CategoryEmbed,
    CategoryODISE,
    PoolingCLIPHead,
    WordEmbed,
    cal_pred_logits,
    category_overlapping_mask,
)
from .wrapper import OpenPanopticInference, OpenVocabulary, build_open_vocabulary
