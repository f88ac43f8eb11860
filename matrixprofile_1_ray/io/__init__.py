from .mpf import from_disk_mpf, from_mpf, to_disk_mpf, to_mpf
from .profiles import profile_row_to_dict, read_profiles, write_profiles
