from nerfail_tpu.utils.chunk import chunked_map, pad_to_multiple

__all__ = ["chunked_map", "pad_to_multiple"]
