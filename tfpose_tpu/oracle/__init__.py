from tfpose_tpu.oracle import numpy_decoder, numpy_post

__all__ = ["numpy_decoder", "numpy_post"]
