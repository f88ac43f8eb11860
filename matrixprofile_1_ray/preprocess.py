"""Reference-layout ``preprocess`` namespace (reference preprocess.py):
imputation, noise injection, constant-window detection and the combined
``preprocess`` entry point.  Aliases of kernels/preprocess.py."""

from .kernels.preprocess import (  # noqa: F401
    add_noise_to_series,
    gapfill,
    impute_missing,
    is_subsequence_constant,
    precheck_series_and_query_1d,
    preprocess,
    to_np_array,
    validate_preprocess_kwargs,
)
