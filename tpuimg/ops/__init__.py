from tpuimg.ops.gaussian import gaussian
from tpuimg.ops.guided import box_filter, guided_filter
from tpuimg.ops.histogram import clahe, hist_equalize
from tpuimg.ops.integral import integral
from tpuimg.ops.morphology import dilate, erode, morph_close, morph_open

__all__ = [
    "gaussian", "box_filter", "guided_filter", "clahe", "hist_equalize",
    "integral", "dilate", "erode", "morph_close", "morph_open",
]
