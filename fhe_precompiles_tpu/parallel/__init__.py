"""Multi-chip scaling: device meshes, sharded batch streams, distributed NTT.

The reference is single-process (SURVEY.md section 2.3); these components give
the TPU framework its scale-out story:

* data parallelism  -- the precompile request stream batches over a `dp` mesh
  axis (each c_fhe_* call is a pure function; SURVEY.md section 2.3).
* tensor parallelism -- the RNS limb axis shards over a `tp` axis; per-limb
  NTT/elementwise work is embarrassingly parallel, base-conversion and
  keyswitch contractions become XLA collectives over ICI.
* sequence-parallel analog -- coefficient-axis sharding of the NTT
  (all-to-all between butterfly stages).
"""
from .mesh import make_mesh, shard_ct_batch  # noqa: F401
from .stream import RequestStream  # noqa: F401
