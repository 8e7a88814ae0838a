"""Device-mesh parallelism.

The reference's only parallel strategy is single-process ``nn.DataParallel``
(``models/multimodal_classifier.py:37-38``) with implicit gradient
reduction.  Here data parallelism is expressed natively: a
``jax.sharding.Mesh`` over ('data', 'model') axes, batch sharded over
'data', parameters replicated (or sharded over 'model' for the widest dense
layers), with XLA inserting ``psum`` over ICI for the gradient reduction.
The point axis can additionally be sharded over 'model' (sequence-parallel
analog) if N grows (SURVEY.md §2.3/§5).
"""
from .mesh import (make_mesh, batch_sharding, shard_batch, shard_state,
                   ShardedEngine)
