"""Ray Data map_batches stages over the sequences / profiles tables.

Every stage is Arrow-in/Arrow-out (``batch_format="pyarrow"``) and
vectorized across the rows of a batch; per-series math lives in
``..kernels``.  Plain functions are stateless tasks; callable classes are
actor pools holding broadcast or rolling state.
"""

from .profile import compute_profiles_batch, profile_stage
from .rollup import rollup_batch, rollup_stage, TIERS, mp_rollup_batch
from .gapfill import gapfill_batch
from .codec_stage import encode_stage, decode_stage, verify_roundtrip_batch
