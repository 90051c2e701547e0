from celerite2_tpu.utils.misc import (
    LinAlgError,
    as_f,
    asarr,
    atleast_1d,
    search_sorted,
)

__all__ = ["search_sorted", "as_f", "asarr", "atleast_1d", "LinAlgError"]
