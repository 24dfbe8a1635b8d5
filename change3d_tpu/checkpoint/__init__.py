from change3d_tpu.checkpoint.convert import (
    convert_x3d_state_dict,
    load_x3d_pretrained,
    x3d_torch_key_map,
)

__all__ = ["convert_x3d_state_dict", "load_x3d_pretrained", "x3d_torch_key_map"]
