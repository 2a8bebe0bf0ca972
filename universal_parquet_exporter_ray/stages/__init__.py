from .encoder import PART_COL, PartitionDecoder, PartitionEncoder  # noqa: F401
from .salting import AssignPartitions, build_salt_map  # noqa: F401
