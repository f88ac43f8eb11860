from .json_io import (
    from_disk,
    from_json,
    infer_file_format,
    to_disk,
    to_json,
)
from .mpf import from_disk_mpf, from_mpf, to_disk_mpf, to_mpf
from .profiles import profile_row_to_dict, read_profiles, write_profiles

__all__ = [
    "to_disk", "from_disk", "to_json", "from_json", "infer_file_format",
    "to_mpf", "from_mpf", "to_disk_mpf", "from_disk_mpf",
    "read_profiles", "write_profiles", "profile_row_to_dict",
]
