"""Reference-layout ``datasets`` subpackage (reference datasets/)."""

from . import datasets  # noqa: F401
from .datasets import fetch_available, load  # noqa: F401
