"""Conformance: PreSCRIMP / SCRIMP++ (reference tests/test_scrimp.py)."""

import numpy as np
import pytest

from matrixprofile_1_ray.kernels import scrimp_plus_plus
from tests.conftest import golden


def test_validation_errors():
    with pytest.raises(ValueError):
        scrimp_plus_plus([1, 2, 3, 4, 5], 4, step_size=-1.0)
    with pytest.raises(ValueError):
        scrimp_plus_plus([1, 2, 3, 4, 5], 4, step_size="a")
    with pytest.raises(ValueError):
        scrimp_plus_plus([1, 2, 3, 4, 5], 4, random_state="adsf")
    with pytest.raises(ValueError):
        scrimp_plus_plus([1, 2, 3, 4, 5], 4)  # too short
    with pytest.raises(ValueError):
        scrimp_plus_plus(list(range(12)), 2)  # window < 4


def test_scrimp_tiny():
    profile = scrimp_plus_plus(np.array([0, 0, 1, 0, 0, 0, 1, 0]), 4,
                               step_size=0.25, sample_pct=1.0)
    np.testing.assert_almost_equal(
        profile["mp"], [0, 3.2660, 3.2660, 3.2660, 0], decimal=4)
    np.testing.assert_array_equal(profile["pi"], [4, 3, 0, 0, 0])


def test_scrimp_matlab(sampledata):
    profile = scrimp_plus_plus(sampledata, 32, step_size=0.25, sample_pct=1.0)
    np.testing.assert_almost_equal(profile["mp"], golden("scrimp.mp.txt"))
    np.testing.assert_array_equal(profile["pi"],
                                  golden("scrimp.mpi.txt").astype("int") - 1)
