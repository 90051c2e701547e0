from celerite2_tpu.utils.misc import search_sorted, as_f, LinAlgError

__all__ = ["search_sorted", "as_f", "LinAlgError"]
