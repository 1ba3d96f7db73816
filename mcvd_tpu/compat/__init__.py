from .torch_ckpt import convert_state_dict, load_reference_checkpoint

__all__ = ["convert_state_dict", "load_reference_checkpoint"]
