"""bloom_filters_ray — a Ray-Data-native data-processing engine built
around the probabilistic sketches of Callidon/bloom-filters.

Layers:
- ``hashing`` / ``formulas``: the shared seeded XXH64 + enhanced
  double-hashing kernel (scalar parity + vectorized numpy).
- ``state``: the 11 sketch structures (Bloom family, Cuckoo, Xor,
  MinHash, CMS, HLL, TopK, IBLT) with reference-parity semantics,
  numpy-backed storage, vectorized bulk ops and JSON serialization.
- ``stages``: Ray Data batch operators (map_batches / groupby stages)
  built on the kernels: shingling, MinHash signatures, LSH banding,
  candidate pairs, verification, connected components, seen-set
  pruning, sketch aggregations, text analysis, ANN, multimodal stubs.
- ``pipelines``: end-to-end pipelines (near-duplicate detection +
  clustering being the flagship).
- ``sources``: synthetic image+caption corpus generator and IO helpers.
"""

__version__ = "0.1.0"

from .hashing import DEFAULT_SEED, xxh64  # noqa: F401

# Install the schema-hash log filter at import time: worker processes
# import this package when unpickling batch fns, so the filter applies
# on every process that can emit the (harmless, noisy) warning.
from .util import _silence_schema_hash_warning as _sshw  # noqa: E402

_sshw()
del _sshw
