from .gzip_codec import gunzip_utf8, gzip_compress  # noqa: F401
from .hashing import stable_hash32, stable_hash_seeded  # noqa: F401
