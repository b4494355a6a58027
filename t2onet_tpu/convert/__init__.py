from t2onet_tpu.convert.torch_checkpoint import (  # noqa: F401
    convert_state_dict,
    load_torch_checkpoint,
)
