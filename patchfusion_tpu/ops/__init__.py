from patchfusion_tpu.ops.resize import (NetResizer, interpolate,
                                        resize_matrix)
from patchfusion_tpu.ops.roi_align import (adaptive_sampling_ratio,
                                           roi_align_batched,
                                           roi_align_single)
from patchfusion_tpu.ops.windows import (pad_to_multiple,
                                         shifted_window_mask,
                                         window_partition, window_reverse)
from patchfusion_tpu.ops.masks import blend_mask, generatemask
from patchfusion_tpu.ops.stitch import AvgMap, paste_dynamic, paste_grid

__all__ = [
    "NetResizer", "interpolate", "resize_matrix",
    "adaptive_sampling_ratio", "roi_align_batched", "roi_align_single",
    "pad_to_multiple", "shifted_window_mask", "window_partition",
    "window_reverse", "blend_mask", "generatemask",
    "AvgMap", "paste_dynamic", "paste_grid",
]
