from .matcher import hungarian_match, MatchResult
from .set_criterion import (
    CriterionConfig,
    get_uncertain_point_coords_with_randomness,
    set_criterion,
)
from .grounding import GroundingConfig, mask_grounding_criterion
