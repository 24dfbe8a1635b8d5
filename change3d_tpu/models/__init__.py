from change3d_tpu.models.x3d import X3D, X3DConfig, x3d_l_config, round_width, round_repeats
from change3d_tpu.models.encoder import Encoder, EMBED_DIMS
from change3d_tpu.models.change_decoder import ChangeDecoder
from change3d_tpu.models.caption_decoder import CaptionDecoder, beam_search_decode, MAX_CAPTION_LEN
from change3d_tpu.models.trainer import Change3D, Task, PERCEPTION_FRAMES

__all__ = [
    "X3D",
    "X3DConfig",
    "x3d_l_config",
    "round_width",
    "round_repeats",
    "Encoder",
    "EMBED_DIMS",
    "ChangeDecoder",
    "CaptionDecoder",
    "beam_search_decode",
    "MAX_CAPTION_LEN",
    "Change3D",
    "Task",
    "PERCEPTION_FRAMES",
]
