from ppsurf_tpu.convert.torch_ckpt import (  # noqa: F401
    convert_state_dict,
    convert_torch_checkpoint,
)
