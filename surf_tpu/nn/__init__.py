from . import core, feature_net, reg_net, volume, matching_field
from . import sdf_net, blending_net, rendering_net, variance, implicit_surface, surf
