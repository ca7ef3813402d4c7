from gastx.io.torch_import import (
    load_torch_checkpoint,
    params_from_state_dict,
    state_dict_from_params,
)

__all__ = [
    "load_torch_checkpoint",
    "params_from_state_dict",
    "state_dict_from_params",
]
