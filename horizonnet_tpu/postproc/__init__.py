"""Post-processing: corner peaks + Manhattan layout fitting.

Peak finding runs on device (horizonnet_tpu.ops.filters); the greedy wall
commitment (gen_ww_general) is intrinsically sequential list manipulation
over <= ~32 walls (SURVEY.md §7 hard parts), so it stays on host where it
costs microseconds.
"""

from .manhattan import (Wall, vote, gen_ww, gen_ww_cuboid, gen_ww_general,
                        get_gpid, get_rot_rad, fuv2img, gpid_two_split)
from .device import (postprocess_cuboid_batch, postprocess_general_batch,
                     pack_cuboid_outputs, pack_general_outputs,
                     vote_sorted, find_4_peaks)
from .serving import (corners_from_walls, general_from_candidates,
                      finish_general_batch, unpack_cuboid_outputs,
                      unpack_general_outputs)

__all__ = ["Wall", "vote", "gen_ww", "gen_ww_cuboid", "gen_ww_general",
           "get_gpid", "get_rot_rad", "fuv2img", "gpid_two_split",
           "postprocess_cuboid_batch", "postprocess_general_batch",
           "pack_cuboid_outputs", "pack_general_outputs",
           "vote_sorted", "find_4_peaks",
           "corners_from_walls", "general_from_candidates",
           "finish_general_batch", "unpack_cuboid_outputs",
           "unpack_general_outputs"]
