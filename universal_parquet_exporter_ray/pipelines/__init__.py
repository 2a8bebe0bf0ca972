from .encode import encode_dataset, read_encoded  # noqa: F401
from .verify import compression_report, decoded_dataset, verify_roundtrip  # noqa: F401
