from .scalars import (
    clip,
    hash64_md5,
    hash_bits_md5,
    pipe_split,
    safe_div,
    sorted_set_join,
)

__all__ = [
    "clip",
    "hash64_md5",
    "hash_bits_md5",
    "pipe_split",
    "safe_div",
    "sorted_set_join",
]
