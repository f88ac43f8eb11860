"""Import-compatibility shim: presents ``matrixprofile_1_ray`` under the
reference library's package name so code (and the reference's own test
suite at /root/reference/tests) that does ``import matrixprofile`` /
``from matrixprofile.algorithms.mpx import mpx`` runs against this engine
unmodified.

Usage: put this directory's parent (``compat/``) on ``PYTHONPATH`` —
``tools/run_reference_tests.sh`` does exactly that.  Nothing in the main
package depends on this shim.

Mechanism: import the real package, then alias every loaded
``matrixprofile_1_ray.*`` module under ``matrixprofile.*`` in
``sys.modules`` so both names resolve to the SAME module objects; set
``__path__`` to the real package's path so any submodule not loaded eagerly
still resolves by file."""

import sys as _sys

import matrixprofile_1_ray as _impl

# Same directory as the real package: reference tests derive their data dir
# from matrixprofile.__path__[0]/../tests/, which lands on this repo's
# tests/ (the vendored golden corpus lives there).
__path__ = list(_impl.__path__)
__version__ = _impl.__version__

_PREFIX = _impl.__name__          # "matrixprofile_1_ray"
for _name, _mod in list(_sys.modules.items()):
    if _mod is None or _name != _PREFIX and not _name.startswith(_PREFIX + "."):
        continue
    _sys.modules.setdefault("matrixprofile" + _name[len(_PREFIX):], _mod)

# Top-level API surface (reference __init__.py exports the same names).
from matrixprofile_1_ray import (  # noqa: E402, F401
    algorithms,
    analyze,
    compute,
    core,
    cycore,
    datasets,
    discover,
    io,
    preprocess,
    transform,
    utils,
    visualize,
)
