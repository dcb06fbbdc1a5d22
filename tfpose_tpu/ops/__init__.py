from tfpose_tpu.ops import assemble, decode, gaussian, nms, paf, resize

__all__ = ["assemble", "decode", "gaussian", "nms", "paf", "resize"]
