"""Pure-NumPy kernels, value-conformant with the reference matrixprofile
library (see SURVEY.md §2).  No Ray imports here."""

from .moving_stats import (
    muinvn,
    moving_avg_std,
    moving_average,
    moving_std,
    moving_min,
    moving_max,
    moving_median,
    rolling_window,
)
from .mass import (
    fft_convolve,
    sliding_dot_product,
    distance_profile,
    mass2,
    apply_exclusion_zone,
    pearson_to_euclidean,
    clean_nan_inf,
    find_skip_locations,
)
from .mpx import mpx_self, mpx_ab, mpx
from .stomp import stomp
from .scrimp import prescrimp, scrimp_plus_plus
from .skimp import skimp, maximum_subsequence, binary_split, pick_mp, empty_mp
from .mpdist import mpdist, mass_distance_matrix, calculate_mpdist, mpdist_vector, pairwise_dist
from .discover import (
    top_k_discords,
    mp_top_k_discords,
    pmp_top_k_discords,
    top_k_motifs,
    mp_top_k_motifs,
    pmp_top_k_motifs,
    fluss,
    extract_regimes,
    idealized_arc_curve,
    snippets,
)
from .stats import statistics
from .preprocess import (
    impute_missing,
    preprocess,
    add_noise_to_series,
    is_subsequence_constant,
    validate_preprocess_kwargs,
)
from .hierarchical import hierarchical_clusters
from .transform import (
    apply_av,
    make_default_av,
    make_complexity_av,
    make_meanstd_av,
    make_clipping_av,
)
from .core_helpers import (
    is_array_like,
    is_similarity_join,
    is_one_dimensional,
    get_profile_length,
    is_nan_inf,
    is_not_nan_inf,
    nan_inf_indices,
    not_nan_inf_indices,
    is_pearson_array,
    is_stats_obj,
    is_mp_obj,
    is_pmp_obj,
    is_mp_or_pmp_obj,
    compute_dist,
)
