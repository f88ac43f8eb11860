"""Reference-layout ``core`` namespace (reference core.py): the structural
predicates, prechecks, moving statistics and MASS primitives that reference
callers import as ``from matrixprofile import core``.  Everything here is an
alias of a kernel that lives in ``kernels/`` — this module only restores the
reference's import layout."""

from .kernels.core_helpers import (  # noqa: F401
    compute_dist,
    generate_batch_jobs,
    get_profile_length,
    is_array_like,
    is_mp_obj,
    is_mp_or_pmp_obj,
    is_nan_inf,
    is_not_nan_inf,
    is_one_dimensional,
    is_pearson_array,
    is_pmp_obj,
    is_similarity_join,
    is_stats_obj,
    nan_inf_indices,
    not_nan_inf_indices,
)
from .kernels.mass import (  # noqa: F401
    apply_exclusion_zone,
    clean_nan_inf,
    distance_profile,
    fft_convolve,
    find_skip_locations,
    pearson_to_euclidean,
    sliding_dot_product,
)
from .kernels.moving_stats import (  # noqa: F401
    moving_average,
    moving_avg_std,
    moving_max,
    moving_median,
    moving_min,
    moving_std,
    muinvn,
    rolling_window,
)
from .kernels.preprocess import (  # noqa: F401
    is_subsequence_constant,
    precheck_series_and_query_1d,
    to_np_array,
)
