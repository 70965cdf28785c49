from .gumbel import gumbel_softmax_sample, gumbel_argmax_ids

__all__ = ["gumbel_softmax_sample", "gumbel_argmax_ids"]
