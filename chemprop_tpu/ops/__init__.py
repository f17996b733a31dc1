from chemprop_tpu.ops.segment import segment_mean, segment_softmax_weights, segment_sum

__all__ = ["segment_mean", "segment_softmax_weights", "segment_sum"]
