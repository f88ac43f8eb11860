from .profiles import read_profiles, write_profiles, profile_row_to_dict
