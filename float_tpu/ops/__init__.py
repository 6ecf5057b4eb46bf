from .activations import fused_leaky_relu, leaky_relu
from .upfirdn import upfirdn2d, make_blur_kernel, blur, upsample2x, downsample2x
from .equalized import equal_linear, equal_conv2d
from .modulated import modulated_conv2d
from .warp import grid_sample_bilinear, identity_grid
from .interp import linear_interpolate_time, nearest_interpolate_time
from .ode import odeint_fixed, ODE_TABLEAUS

__all__ = [
    "fused_leaky_relu", "leaky_relu",
    "upfirdn2d", "make_blur_kernel", "blur", "upsample2x", "downsample2x",
    "equal_linear", "equal_conv2d",
    "modulated_conv2d",
    "grid_sample_bilinear", "identity_grid",
    "linear_interpolate_time", "nearest_interpolate_time",
    "odeint_fixed", "ODE_TABLEAUS",
]
