from .grid_sample import grid_sample, point_sample
from .lap import auction_lap, linear_sum_assignment
from .ms_deform_attn import ms_deform_attn
